"""Corpus-overlap ingest state ≡ batch group_minhash_overlap over the
same documents (estimate columns); replays are no-ops; MIN-merge means
duplicate delivery cannot move the estimate."""

from __future__ import annotations

import json

from music_streaming_data_pipeline_v2_spark.operators.dedup import (
    group_minhash_overlap,
)
from music_streaming_data_pipeline_v2_spark.streaming.overlap_ingest import (
    query_overlap,
    run_incremental_overlap,
)

DOCS_W1 = [
    (0, "alpha beta gamma delta epsilon zeta", "a"),
    (1, "alpha beta gamma delta nine ten", "b"),
    (2, "uno dos tres cuatro cinco seis", "c"),
]
DOCS_W2 = [
    (10, "alpha beta gamma delta epsilon zeta", "c"),  # c now overlaps a
    (11, "seven eight nine ten eleven twelve", "a"),
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
    return group_minhash_overlap(df, "source", with_exact=False).select(
        "g_a", "g_b", "est_matches", "est_permille"
    )


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_overlap_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_overlap(spark, str(inp), str(work))
    got1 = _vals(query_overlap(spark, str(work)))
    assert got1 == _vals(_batch(spark, DOCS_W1))

    # wave 2: history is never re-shingled, yet the (a, c) estimate
    # moves because c gained a's shingles (elementwise MIN absorbed
    # the new, smaller hashes)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_overlap(spark, str(inp), str(work))
    got2 = _vals(query_overlap(spark, str(work)))
    assert got2 == _vals(_batch(spark, DOCS_W1 + DOCS_W2))
    assert got2 != got1

    ac1 = {(a, b): m for a, b, m, _ in got1}
    ac2 = {(a, b): m for a, b, m, _ in got2}
    assert ac2[("a", "c")] > ac1[("a", "c")]

    # replay: re-draining the same input is a no-op (checkpointed
    # source + per-batch overwrite + idempotent MIN)
    run_incremental_overlap(spark, str(inp), str(work))
    assert _vals(query_overlap(spark, str(work))) == got2


def test_duplicate_delivery_cannot_move_the_estimate(spark, tmp_path):
    # the SAME documents split across two waves in overlapping ways:
    # MIN idempotence makes the merged signature identical to one-shot
    inp1 = tmp_path / "in1"
    inp2 = tmp_path / "in2"
    w1 = tmp_path / "work1"
    w2 = tmp_path / "work2"
    inp1.mkdir()
    inp2.mkdir()

    _write_wave(inp1 / "all.jsonl", DOCS_W1 + DOCS_W2)
    run_incremental_overlap(spark, str(inp1), str(w1))

    _write_wave(inp2 / "w1.jsonl", DOCS_W1 + DOCS_W2[:1])
    run_incremental_overlap(spark, str(inp2), str(w2))
    _write_wave(inp2 / "w2.jsonl", DOCS_W2)  # doc 10 delivered TWICE
    run_incremental_overlap(spark, str(inp2), str(w2))

    assert _vals(query_overlap(spark, str(w1))) == _vals(
        query_overlap(spark, str(w2))
    )
