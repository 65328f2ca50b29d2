"""Incremental count-min sketch at ingest ≡ batch sketch over the same
rows; replays are no-ops; estimates never undercount the true totals
across waves."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.frequency import (
    count_min_cells,
    count_min_estimate,
)
from music_streaming_data_pipeline_v2_spark.operators.packing import (
    engine_safe_tokens,
)
from music_streaming_data_pipeline_v2_spark.streaming.sketch_ingest import (
    query_estimates,
    run_incremental_sketch,
)

W, D = 256, 3

DOCS_W1 = [
    (0, "apple banana apple", "a"),
    (1, "banana cherry", "a"),
    (2, "apple date", "b"),
]
DOCS_W2 = [
    (10, "cherry cherry apple", "c"),
    (11, "elderberry", "c"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text, src in rows:
            fh.write(
                json.dumps({"doc_id": did, "text": text, "source": src})
                + "\n"
            )


def _tokens(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return df.select(
        F.explode(F.transform(engine_safe_tokens("text"), F.lower)).alias(
            "token"
        )
    )


def _batch_estimates(spark, rows, keys):
    toks = _tokens(spark, rows)
    cells = count_min_cells(toks, "token", W, D)
    return count_min_estimate(keys, cells, "token", W, D)


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_sketch_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    keys = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("missing",)],
        "token string",
    )

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_sketch(spark, str(inp), str(work), width=W, depth=D)
    got1 = _vals(query_estimates(spark, str(work), keys, width=W, depth=D))
    assert got1 == _vals(_batch_estimates(spark, DOCS_W1, keys))

    # wave 2: history never re-sketched, yet the merged estimates equal
    # a batch sketch over the full concatenation (cells are additive)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_sketch(spark, str(inp), str(work), width=W, depth=D)
    got2 = _vals(query_estimates(spark, str(work), keys, width=W, depth=D))
    assert got2 == _vals(_batch_estimates(spark, DOCS_W1 + DOCS_W2, keys))

    # never undercount the exact cross-wave totals; a never-inserted
    # key may collide but must not invent a shortfall
    exact = {
        r["token"]: r["c"]
        for r in _tokens(spark, DOCS_W1 + DOCS_W2)
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for token, est in got2:
        assert est >= exact.get(token, 0)

    # replay with no new files: state unchanged, results unchanged
    run_incremental_sketch(spark, str(inp), str(work), width=W, depth=D)
    assert _vals(query_estimates(spark, str(work), keys, width=W, depth=D)) == got2


def test_query_before_any_drain_returns_zero_estimates(spark, tmp_path):
    keys = spark.createDataFrame([("apple",)], "token string")
    out = query_estimates(
        spark, str(tmp_path / "nothing"), keys, width=W, depth=D
    )
    assert _vals(out) == [("apple", 0)]


def test_geometry_mismatch_rejected(spark, tmp_path):
    import pytest

    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_sketch(spark, str(inp), str(work), width=W, depth=D)
    keys = spark.createDataFrame([("apple",)], "token string")
    # wrong geometry on the readout: refused, never a silent undercount
    with pytest.raises(ValueError, match="pinned"):
        query_estimates(spark, str(work), keys, width=W * 2, depth=D)
    # wrong geometry on a later drain: refused before any state write
    with pytest.raises(ValueError, match="pinned"):
        run_incremental_sketch(
            spark, str(inp), str(work), width=W, depth=D + 1
        )
    # pinned defaults still read fine
    assert query_estimates(
        spark, str(work), keys, width=W, depth=D
    ).count() == 1
