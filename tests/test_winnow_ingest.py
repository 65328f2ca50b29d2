"""Winnow-index-at-ingest: incremental postings ≡ the batch fp-join
over the same documents; cross-batch passage overlap is detected;
replays are no-ops; undrained state reads are empty, not crashes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.text import (
    winnow_fingerprints,
)
from music_streaming_data_pipeline_v2_spark.streaming.winnow_ingest import (
    query_overlap_pairs,
    run_incremental_winnow,
)

_SHARED = "alpha beta gamma delta epsilon zeta eta theta"
DOCS_W1 = [
    (0, f"intro words {_SHARED} closing remarks"),
    (1, "completely unrelated text about other things entirely"),
]
DOCS_W2 = [
    (10, f"different opening {_SHARED} and a different tail"),
    (11, "more unrelated filler tokens beyond any overlap"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text in rows:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")


def _batch_pairs(spark, rows, min_shared=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sk = winnow_fingerprints(df, k=3, window=4)
    a = sk.select(F.col("doc_id").alias("id_a"), "fp")
    b = sk.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def _pairs(df):
    return sorted((r.id_a, r.id_b, r.n_shared_fps) for r in df.collect())


def test_incremental_winnow_matches_batch_and_crosses_batches(
    spark, tmp_path
):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_winnow(spark, str(inp), str(work))
    got1 = _pairs(query_overlap_pairs(spark, str(work), min_shared=1))
    assert got1 == _pairs(_batch_pairs(spark, DOCS_W1))

    # wave 2: history is NOT re-sketched, yet the shared passage pairs
    # doc 0 (wave 1) with doc 10 (wave 2) — cross-batch detection.
    # min_shared=1: the winnowing guarantee promises >= 1 common fp
    # for the shared run, and the 64-bit default hash makes any
    # shared fp meaningful
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_winnow(spark, str(inp), str(work))
    got2 = _pairs(query_overlap_pairs(spark, str(work), min_shared=1))
    assert got2 == _pairs(_batch_pairs(spark, DOCS_W1 + DOCS_W2))
    assert any(a == 0 and b == 10 for a, b, _ in got2)

    # replay with no new files: state unchanged, results unchanged
    run_incremental_winnow(spark, str(inp), str(work))
    assert _pairs(query_overlap_pairs(spark, str(work), min_shared=1)) == got2
    st = spark.read.parquet(str(work / "postings"))
    assert (
        st.count()
        == st.select("doc_id", "fp", "batch_id").distinct().count()
    )


def test_query_before_any_drain_is_empty_not_crash(spark, tmp_path):
    out = query_overlap_pairs(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "id_a",
        "id_b",
        "n_shared_fps",
    ]
