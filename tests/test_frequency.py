"""Misra-Gries heavy hitters: summary-size bound, no-false-negative
guarantee, and sketch+verify ≡ exact-groupBy equivalence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.frequency import (
    frequent_items,
    mg_partition_summaries,
)


def _zipf_df(spark, n_rows=20000, n_parts=8):
    # hot head: v0..v4 cover ~half the rows; long uniform tail
    return (
        spark.range(n_rows)
        .repartition(n_parts)
        .selectExpr(
            "CASE WHEN id % 2 = 0 THEN concat('hot', id % 5) "
            "ELSE concat('tail', id % 4000) END AS value"
        )
    )


def test_summary_size_bounded(spark):
    df = _zipf_df(spark, n_parts=8)
    k = 50
    summaries = mg_partition_summaries(df, "value", k)
    assert summaries.count() <= 8 * k


@pytest.mark.parametrize("n_parts", [1, 4, 16])
def test_equals_exact_groupby_across_partitionings(spark, n_parts):
    df = _zipf_df(spark, n_parts=n_parts)
    phi = 0.01
    got = sorted(
        (r.value, r.n_occurrences)
        for r in frequent_items(df, "value", phi).collect()
    )
    n = df.count()
    t = max(int(math.ceil(phi * n)), 1)
    exact = sorted(
        (r.value, r["count"])
        for r in df.groupBy("value").count().filter(F.col("count") >= t).collect()
    )
    assert got == exact and len(got) == 5  # the 5 hot values


def test_no_false_negatives_at_minimum_k(spark):
    """The guarantee boundary: k = ceil(1/phi) exactly must still
    never lose a true heavy hitter."""
    df = _zipf_df(spark, n_parts=8)
    phi = 0.02
    got = {r.value for r in
           frequent_items(df, "value", phi, k=math.ceil(1 / phi)).collect()}
    n = df.count()
    t = max(int(math.ceil(phi * n)), 1)
    truth = {
        r.value
        for r in df.groupBy("value").count().filter(F.col("count") >= t).collect()
    }
    assert truth <= got or truth == got
    assert got == truth  # exact verify also removes false positives


def test_k_below_guarantee_raises(spark):
    df = _zipf_df(spark)
    with pytest.raises(ValueError):
        frequent_items(df, "value", 0.01, k=50)
    with pytest.raises(ValueError):
        frequent_items(df, "value", 0.0)


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), ("b",)], ["value"]
    )
    got = {(r.value, r.n_occurrences)
           for r in frequent_items(df, "value", 0.5).collect()}
    # n counts non-null rows only: 4 rows, threshold 2 → only 'a'
    assert got == {("a", 3)}


def test_count_min_never_undercounts_and_exact_at_wide_width(spark):
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        count_min_cells,
        count_min_estimate,
    )

    df = _zipf_df(spark, n_rows=5000, n_parts=4)
    exact = {
        r["value"]: r["c"]
        for r in df.groupBy("value").agg(F.count("*").alias("c")).collect()
    }
    keys = df.select("value").distinct()

    # narrow sketch: collisions certain, but never an undercount
    cells = count_min_cells(df, "value", width=64, depth=3)
    est = {
        r["value"]: r["est_count"]
        for r in count_min_estimate(keys, cells, "value", 64, 3).collect()
    }
    assert set(est) == set(exact)
    assert all(est[v] >= exact[v] for v in exact)
    # total sketch mass per depth row equals the row count
    per_depth = {
        r["depth_row"]: r["s"]
        for r in cells.groupBy("depth_row")
        .agg(F.sum("cell_count").alias("s"))
        .collect()
    }
    assert per_depth == {0: 5000, 1: 5000, 2: 5000}

    # width >> distinct values: estimates collapse to exact counts
    wide = count_min_cells(df, "value", width=65536, depth=4)
    est_w = {
        r["value"]: r["est_count"]
        for r in count_min_estimate(keys, wide, "value", 65536, 4).collect()
    }
    assert est_w == exact


def test_count_min_mergeable_cells(spark):
    """Sketches over disjoint corpora merge by cell-wise addition."""
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        count_min_cells,
        count_min_estimate,
    )

    df = _zipf_df(spark, n_rows=2000, n_parts=4)
    a = df.filter(F.col("value").startswith("hot"))
    b = df.filter(~F.col("value").startswith("hot"))
    merged = (
        count_min_cells(a, "value", 128, 2)
        .unionByName(count_min_cells(b, "value", 128, 2))
        .groupBy("depth_row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    whole = count_min_cells(df, "value", 128, 2)
    keys = df.select("value").distinct()
    got = count_min_estimate(keys, merged, "value", 128, 2).collect()
    want = count_min_estimate(keys, whole, "value", 128, 2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_count_min_weighted_path_equals_occurrence_semantics(spark):
    """r9 optimization pin: the distinct-collapse builder (and its
    explicit weight_col fast path) produces cells identical to the
    per-occurrence definition — cell_count = Σ_key count(key)·[key→cell]."""
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        _cm_placements,
        count_min_cells,
    )

    df = _zipf_df(spark, n_rows=3000, n_parts=4)
    got = count_min_cells(df, "value", 256, 3)
    # per-occurrence reference: explode every row into its placements
    ref = (
        df.filter(F.col("value").isNotNull())
        .select(F.explode(_cm_placements(F.col("value"), 256, 3)).alias("_p"))
        .groupBy("_p.depth_row", "_p.bucket")
        .agg(F.count("*").alias("cell_count"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # weight_col fast path over a precomputed (key, count) relation
    counts = df.groupBy("value").agg(F.count("*").alias("n"))
    via_weights = count_min_cells(counts, "value", 256, 3, weight_col="n")
    assert sorted(map(tuple, via_weights.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_hll_registers_duplicate_invariant(spark):
    """r9 optimization pin: registers are a pure function of the
    DISTINCT (group, key) set — duplicating rows changes nothing
    (max(rho) over repeats), so the collapse-before-hash builder is
    semantics-identity."""
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_registers,
    )

    base = spark.range(500).selectExpr(
        "concat('g', id % 3) AS g", "concat('k', id % 97) AS k"
    )
    dup = base.union(base).union(base.limit(200))
    got = sorted(map(tuple, hll_registers(dup, "k", ["g"]).collect()))
    want = sorted(map(tuple, hll_registers(base, "k", ["g"]).collect()))
    assert got == want
