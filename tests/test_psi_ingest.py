"""Drift monitoring at ingest: incremental PSI state ≡ batch psi_drift
over the same documents; replays are no-ops; a shifted wave moves the
reference and re-scores every group exactly."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.drift import psi_drift
from music_streaming_data_pipeline_v2_spark.streaming.psi_ingest import (
    DEFAULT_BIN_SQL,
    query_psi,
    run_incremental_psi,
)

DOCS_W1 = [
    (0, "short", "a"),
    (1, "x" * 100, "a"),
    (2, "y" * 200, "b"),
    (3, "tiny", "b"),
    (4, "z" * 150, "a"),
]
DOCS_W2 = [
    (10, "q" * 600, "c"),
    (11, "r" * 580, "c"),
    (12, "s" * 90, "a"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text, src in rows:
            fh.write(
                json.dumps({"doc_id": did, "text": text, "source": src})
                + "\n"
            )


def _batch_psi(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return psi_drift(df, "source", F.expr(DEFAULT_BIN_SQL))


def _vals(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


def test_incremental_psi_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_psi(spark, str(inp), str(work))
    got1 = _vals(query_psi(spark, str(work)))
    assert got1 == _vals(_batch_psi(spark, DOCS_W1))

    # wave 2: history is NOT re-binned, yet every group's PSI shifts
    # exactly as if the whole corpus were re-audited (reference moved)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_psi(spark, str(inp), str(work))
    got2 = _vals(query_psi(spark, str(work)))
    assert got2 == _vals(_batch_psi(spark, DOCS_W1 + DOCS_W2))
    assert dict((g, p) for g, _, p in got1) != dict(
        (g, p) for g, _, p in got2 if g in ("a", "b")
    )

    # replay with no new files: state unchanged, results unchanged
    run_incremental_psi(spark, str(inp), str(work))
    assert _vals(query_psi(spark, str(work))) == got2
    # no duplicate state rows from the replay (a cell MAY repeat
    # across batch partitions — different waves histogram the same
    # (grp, bin) — but never within one)
    st = spark.read.parquet(str(work / "cells"))
    assert st.count() == st.select("grp", "bin", "batch_id").distinct().count()


def test_incremental_psi_flags_shifted_source(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    # many balanced docs in a/b; c arrives with a very different
    # length profile and must carry the largest PSI
    stable = [
        (i, "w" * (40 + (i % 5) * 60), "a" if i % 2 else "b")
        for i in range(40)
    ]
    shifted = [(100 + i, "v" * 560, "c") for i in range(6)]
    _write_wave(inp / "w1.jsonl", stable)
    _write_wave(inp / "w2.jsonl", shifted)
    run_incremental_psi(spark, str(inp), str(work))
    got = {r.grp: r.psi for r in query_psi(spark, str(work)).collect()}
    assert got["c"] > got["a"] and got["c"] > got["b"]
    assert got["c"] > 0.25


def test_query_before_any_drain_is_empty_not_crash(spark, tmp_path):
    out = query_psi(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["grp", "n_rows", "psi"]


def test_incremental_ks_matches_batch_binned(spark, tmp_path):
    # the SAME cells serve the KS readout: query_ks over drained state
    # == batch ks_drift on the binned value over all drained docs
    from music_streaming_data_pipeline_v2_spark.operators.drift import (
        ks_drift,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.psi_ingest import (
        query_ks,
    )

    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_psi(spark, str(inp), str(work))
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_psi(spark, str(inp), str(work))

    rows = DOCS_W1 + DOCS_W2
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).selectExpr("source", f"CAST({DEFAULT_BIN_SQL} AS BIGINT) AS b")
    batch = ks_drift(df, "source", "b")
    got = sorted(tuple(r) for r in query_ks(spark, str(work)).collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want
    # and the statistic is non-trivial on this data (c is length-shifted)
    assert any(r[-1] > 0 for r in got)
