"""Z-order layout: Morton-code correctness and the bounded-rectangle
file-layout property that makes two-dimensional zone-map pruning work."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.zorder import (
    zorder_layout,
    zvalue,
)


def _interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_bit_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)], ["x", "y"]
    )
    rows = df.select("x", "y", zvalue("x", "y", 6).alias("z")).collect()
    for r in rows:
        assert r.z == _interleave(r.x, r.y, 6), (r.x, r.y)


def test_zvalue_rejects_overflowing_bit_width():
    import pytest

    from music_streaming_data_pipeline_v2_spark.operators.zorder import (
        zvalue_sql,
    )

    with pytest.raises(ValueError):
        zvalue_sql("x", "y", 32)
    with pytest.raises(ValueError):
        zvalue_sql("x", "y", 0)


def test_zvalue_ignores_out_of_range_bits(spark):
    # bits above the configured width are masked, not thrown
    df = spark.createDataFrame([(70, 3)], ["x", "y"])  # 70 >= 2^6
    r = df.select(zvalue("x", "y", 6).alias("z")).first()
    assert r.z == _interleave(70 & 63, 3, 6)


def _files_touched(spark, path, lo, hi, col):
    """Zone-map pruning simulation: files whose [min, max] on ``col``
    intersects [lo, hi] — exactly what a reader's file-level min/max
    stats admit."""
    stats = (
        spark.read.parquet(path)
        .withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return sum(1 for s in stats if s.lo <= hi and s.hi >= lo), len(stats)


def test_zorder_prunes_on_either_dimension(spark, tmp_path):
    """Over a 256×256 uniform grid written as 16 z-ordered files, a
    narrow slab predicate on EITHER axis must admit well under half
    the files by min/max stats. The linear-sort contrast: sorted by x,
    the same y-slab admits EVERY file (each spans all of y). Per-file
    boxes are deliberately not asserted — a z-range crossing a major
    quadrant boundary legitimately spans one full axis; pruning
    effectiveness is the semantics that matters."""
    n = 256
    grid = spark.range(n * n).selectExpr(
        f"CAST(id % {n} AS INT) x", f"CAST(id DIV {n} AS INT) y"
    )
    out = str(tmp_path / "zorder")
    zorder_layout(grid, "x", "y", bits=8, n_files=16).write.parquet(out)

    hit_x, total = _files_touched(spark, out, 100, 110, "x")
    hit_y, _ = _files_touched(spark, out, 100, 110, "y")
    assert total >= 8
    assert hit_x <= total // 2, (hit_x, total)
    assert hit_y <= total // 2, (hit_y, total)

    # contrast: linear sort on x leaves y unprunable in every file
    lout = str(tmp_path / "linear")
    grid.repartitionByRange(16, F.col("x")).sortWithinPartitions(
        "x"
    ).write.parquet(lout)
    lhit_y, ltotal = _files_touched(spark, lout, 100, 110, "y")
    assert lhit_y == ltotal
