"""Incremental HLL register state at ingest ≡ batch sketch over the
same rows; replays are no-ops; mismatched schemes are rejected."""

from __future__ import annotations

import json

import pytest

from music_streaming_data_pipeline_v2_spark.operators.frequency import (
    hll_distinct,
)
from music_streaming_data_pipeline_v2_spark.streaming.hll_ingest import (
    query_cardinality,
    run_incremental_hll,
)

WAVE1 = [("d1", f"u{i}") for i in range(40)] + [("d2", f"u{i}") for i in range(5)]
WAVE2 = [("d1", f"u{i}") for i in range(20, 60)] + [("d3", "solo")]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for g, k in rows:
            fh.write(json.dumps({"group": g, "key": k}) + "\n")


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_hll_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", WAVE1)
    run_incremental_hll(spark, str(inp), work)
    batch1 = hll_distinct(
        spark.createDataFrame(WAVE1, "group string, key string"),
        "key",
        ["group"],
    )
    assert _vals(query_cardinality(spark, work)) == _vals(batch1)

    _write_wave(inp / "w2.jsonl", WAVE2)
    run_incremental_hll(spark, str(inp), work)
    both = hll_distinct(
        spark.createDataFrame(WAVE1 + WAVE2, "group string, key string"),
        "key",
        ["group"],
    )
    assert _vals(query_cardinality(spark, work)) == _vals(both)

    # replay with no new files: a no-op, state unchanged
    run_incremental_hll(spark, str(inp), work)
    assert _vals(query_cardinality(spark, work)) == _vals(both)

    # sanity on the estimates themselves: sparse groups are near-exact
    est = {r["group"]: r["approx_count"] for r in query_cardinality(
        spark, work
    ).collect()}
    assert abs(est["d1"] - 60) / 60 < 0.15
    assert abs(est["d2"] - 5) <= 1
    assert abs(est["d3"] - 1) <= 1


def test_hll_scheme_mismatch_rejected(spark, tmp_path, monkeypatch):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", WAVE1[:3])
    run_incremental_hll(spark, str(inp), work)

    from music_streaming_data_pipeline_v2_spark.streaming import hll_ingest

    monkeypatch.setattr(hll_ingest, "HLL_ADDR_VERSION", 99)
    with pytest.raises(ValueError, match="not mergeable"):
        query_cardinality(spark, work)
