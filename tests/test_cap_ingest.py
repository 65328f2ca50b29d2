"""Per-domain-cap ingest state ≡ batch group_cap_sample over the same
documents; replays are no-ops; k-MIN mergeability means duplicate
delivery cannot crowd out a survivor."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    group_cap_sample,
)
from music_streaming_data_pipeline_v2_spark.streaming.cap_ingest import (
    query_capped,
    run_incremental_cap,
)

CAP = 3

DOCS_W1 = [
    (0, "alpha beta", "a"),
    (1, "gamma delta", "a"),
    (2, "epsilon zeta", "a"),
    (3, "uno dos", "b"),
    (4, "tres cuatro", "a"),  # a exceeds the cap already in wave 1
]
DOCS_W2 = [
    (10, "cinco seis", "a"),   # may displace a wave-1 survivor
    (11, "siete ocho", "b"),
    (12, "nueve diez", "b"),
    (13, "once doce", "b"),    # b exceeds the cap only with wave 2
    (14, "trece catorce", "c"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text, src in rows:
            fh.write(
                json.dumps({"doc_id": did, "text": text, "source": src})
                + "\n"
            )


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    return group_cap_sample(df, "source", "doc_id", CAP).select(
        F.col("source").alias("g"), "doc_id"
    )


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_cap_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_cap(spark, str(inp), str(work), CAP)
    got1 = _vals(query_capped(spark, str(work), CAP))
    assert got1 == _vals(_batch(spark, DOCS_W1))
    assert sum(1 for g, _ in got1 if g == "a") == CAP  # cap bites

    # wave 2: history is never re-hashed, yet the kept sets are
    # exactly the batch quota over the full corpus
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_cap(spark, str(inp), str(work), CAP)
    got2 = _vals(query_capped(spark, str(work), CAP))
    assert got2 == _vals(_batch(spark, DOCS_W1 + DOCS_W2))
    assert sum(1 for g, _ in got2 if g == "b") == CAP

    # replay: re-draining the same input is a no-op
    run_incremental_cap(spark, str(inp), str(work), CAP)
    assert _vals(query_capped(spark, str(work), CAP)) == got2


def test_duplicate_delivery_cannot_crowd_out_survivors(spark, tmp_path):
    # the SAME documents split across overlapping waves: the (g,
    # doc_id) dedup before the query rank absorbs re-delivery, so the
    # kept set matches the one-shot drain exactly
    inp1 = tmp_path / "in1"
    inp2 = tmp_path / "in2"
    w1 = tmp_path / "work1"
    w2 = tmp_path / "work2"
    inp1.mkdir()
    inp2.mkdir()

    _write_wave(inp1 / "all.jsonl", DOCS_W1 + DOCS_W2)
    run_incremental_cap(spark, str(inp1), str(w1), CAP)

    _write_wave(inp2 / "w1.jsonl", DOCS_W1 + DOCS_W2[:2])
    _write_wave(inp2 / "w2.jsonl", DOCS_W1[2:] + DOCS_W2)  # heavy overlap
    run_incremental_cap(spark, str(inp2), str(w2), CAP)

    assert _vals(query_capped(spark, str(w1), CAP)) == _vals(
        query_capped(spark, str(w2), CAP)
    )


def test_empty_state_returns_empty(spark, tmp_path):
    out = query_capped(spark, str(tmp_path / "nowhere"), CAP)
    assert out.count() == 0
    assert out.columns == ["g", "doc_id"]
