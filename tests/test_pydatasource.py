"""Spark 4 Python DataSource connector (io/pydatasource.py): batch
read, true filter pushdown (pruned ids are never generated), and the
offset-tracked streaming reader with deterministic replay."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.io.pydatasource import (
    _gen_row,
    make_synthetic_source,
    register_synthetic,
)


def _read(spark, n=1000, parts=4):
    register_synthetic(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("parts", parts)
        .load()
    )


def test_batch_read_matches_reference_rows(spark):
    got = sorted(tuple(r) for r in _read(spark, n=300).collect())
    want = sorted(_gen_row(i) for i in range(300))
    assert got == want


def test_partition_count_respected(spark):
    df = _read(spark, n=1000, parts=8)
    assert df.rdd.getNumPartitions() == 8


def test_filter_pushdown_prunes_generation():
    # unit level: pushFilters narrows the generation window and
    # consumes the range predicates (nothing re-evaluated by Spark)
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    src = make_synthetic_source()(
        {"n": "1000", "parts": "4"}
    )
    reader = src.reader(None)
    residual = list(
        reader.pushFilters(
            [
                IsNotNull(("id",)),
                GreaterThanOrEqual(("id",), 100),
                LessThan(("id",), 200),
                EqualTo(("lang",), "en"),  # not on id: stays with Spark
            ]
        )
    )
    assert (reader.lo, reader.hi) == (100, 200)
    kinds = {type(f).__name__ for f in residual}
    assert kinds == {"IsNotNull", "EqualTo"}
    parts = reader.partitions()
    assert sum(p.hi - p.lo for p in parts) == 100
    ids = [i for p in parts for i in range(p.lo, p.hi)]
    assert ids == list(range(100, 200))


def test_pushdown_end_to_end_correct(spark):
    df = _read(spark, n=1000).filter(
        (F.col("id") >= 40) & (F.col("id") <= 45)
    )
    assert sorted(r["id"] for r in df.collect()) == [40, 41, 42, 43, 44, 45]


def test_empty_pushdown_window(spark):
    df = _read(spark, n=1000).filter(
        (F.col("id") > 800) & (F.col("id") < 100)
    )
    assert df.count() == 0


def test_streaming_reader_exactly_covers_corpus(spark):
    register_synthetic(spark)
    with tempfile.TemporaryDirectory() as ckpt:
        stream = (
            spark.readStream.format("synthetic_docs")
            .option("n", 250)
            .option("rows_per_batch", 64)
            .load()
        )
        # default trigger + processAllAvailable, not availableNow: the
        # simple-reader prefetch wrapper plans ONE batch per trigger,
        # so availableNow would stop after the first prefetched batch;
        # processAllAvailable drains until read() reports an unchanged
        # offset (lo == n → empty batch)
        q = (
            stream.writeStream.format("memory")
            .queryName("pyds_stream")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM pyds_stream").collect()
        )
    want = sorted(_gen_row(i) for i in range(250))
    assert got == want  # each id exactly once: offsets never re-deliver


def test_stream_replay_deterministic():
    src = make_synthetic_source()({"n": "100", "rows_per_batch": "30"})
    r = src.simpleStreamReader(None)
    start = r.initialOffset()
    rows1, mid = r.read(start)
    assert mid == {"next": 30}
    replay = list(r.readBetweenOffsets(start, mid))
    assert replay == list(r._rows(0, 30)) and len(replay) == 30
    # final batch clamps at n
    _, off = r.read({"next": 90})
    assert off == {"next": 100}


# ---------------------------------------------------------------------------
# jsonl_manifest sink (write-audit-publish)
# ---------------------------------------------------------------------------


def test_jsonl_sink_manifest_publish(spark, tmp_path):
    import json
    import os

    from music_streaming_data_pipeline_v2_spark.io.pydatasource import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(57)], "id long, name string"
    ).repartition(4)
    df.write.format("jsonl_manifest").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["n_rows"] == 57
    assert len(manifest["files"]) == 4
    assert sum(f["n_rows"] for f in manifest["files"]) == 57
    # staging fully promoted; only manifest-listed files remain
    names = sorted(os.listdir(out))
    assert "_staging" not in names
    listed = {f["name"] for f in manifest["files"]}
    assert listed == {n for n in names if n.endswith(".jsonl")}
    # rows round-trip through the published files
    rows = []
    for n in listed:
        with open(os.path.join(out, n)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted((r["id"], r["name"]) for r in rows) == [
        (i, f"d{i}") for i in range(57)
    ]


def test_jsonl_sink_requires_path(spark):
    import pytest as _pytest

    from music_streaming_data_pipeline_v2_spark.io.pydatasource import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    df = spark.range(3)
    with _pytest.raises(Exception, match="path"):
        df.write.format("jsonl_manifest").mode("append").save()


def test_jsonl_sink_abort_leaves_no_staging(spark, tmp_path):
    import os

    from music_streaming_data_pipeline_v2_spark.io.pydatasource import (
        make_jsonl_sink,
    )

    # drive the protocol directly: stage via abort() after a fake
    # failure — the staging dir disappears, no manifest is written
    sink_cls = make_jsonl_sink()
    out = str(tmp_path / "aborted")
    os.makedirs(os.path.join(out, "_staging"), exist_ok=True)
    with open(os.path.join(out, "_staging", "part-0-0.jsonl"), "w") as fh:
        fh.write('{"id": 1}\n')
    writer = sink_cls({"path": out}).writer(None, False)
    writer.abort([])
    assert not os.path.exists(os.path.join(out, "_staging"))
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))


def test_jsonl_sink_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') must leave a directory a PLAIN listing reader
    can trust (ADVICE r6): parts from the replaced write are removed,
    so listing == manifest == new data, never a stale/new mix."""
    import json
    import os

    from music_streaming_data_pipeline_v2_spark.io.pydatasource import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path / "sink")
    first = spark.createDataFrame(
        [(i, "old") for i in range(40)], "id long, name string"
    ).repartition(5)
    first.write.format("jsonl_manifest").option("path", out).mode(
        "append"
    ).save()
    assert len([n for n in os.listdir(out) if n.endswith(".jsonl")]) == 5

    second = spark.createDataFrame(
        [(i, "new") for i in range(7)], "id long, name string"
    ).repartition(2)
    second.write.format("jsonl_manifest").option("path", out).mode(
        "overwrite"
    ).save()
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["n_rows"] == 7
    names = {n for n in os.listdir(out) if n.endswith(".jsonl")}
    assert names == {f["name"] for f in manifest["files"]}
    rows = []
    for n in names:
        with open(os.path.join(out, n)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(7))
    assert {r["name"] for r in rows} == {"new"}
