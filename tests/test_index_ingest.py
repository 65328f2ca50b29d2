"""Retrieval-index-at-ingest: incremental state ≡ batch bm25_topk over
the same documents; replays are no-ops; empty batches are safe."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.text import bm25_topk
from music_streaming_data_pipeline_v2_spark.streaming.index_ingest import (
    query_index,
    run_incremental_index,
)

DOCS_W1 = [
    (0, "spark window join over events"),
    (1, "hash table scan fast"),
    (2, "window window window spark"),
]
DOCS_W2 = [
    (10, "join the hash join club"),
    (11, "completely unrelated words here"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text in rows:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")


def _q(spark):
    return spark.createDataFrame(
        [(0, "spark window"), (1, "hash join")], "query_id int, text string"
    )


def _ranked(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in df.collect()
    )


def test_incremental_index_matches_batch_bm25(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_index(spark, str(inp), str(work))
    got1 = _ranked(query_index(spark, str(work), _q(spark), k=5))
    corpus1 = spark.createDataFrame(DOCS_W1, "doc_id long, text string")
    want1 = _ranked(bm25_topk(corpus1, _q(spark), k=5))
    assert got1 == want1

    # wave 2: history is NOT re-tokenized, yet scores shift exactly as
    # if the whole corpus were re-indexed (df/N/avgdl all move)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_index(spark, str(inp), str(work))
    got2 = _ranked(query_index(spark, str(work), _q(spark), k=5))
    corpus2 = spark.createDataFrame(
        DOCS_W1 + DOCS_W2, "doc_id long, text string"
    )
    want2 = _ranked(bm25_topk(corpus2, _q(spark), k=5))
    assert got2 == want2
    assert got2 != got1  # the statistics really moved

    # replay with no new files: state unchanged, results unchanged
    run_incremental_index(spark, str(inp), str(work))
    assert _ranked(query_index(spark, str(work), _q(spark), k=5)) == got2
    # no duplicate postings rows from the replay
    n_postings = spark.read.parquet(str(work / "postings")).count()
    distinct = (
        spark.read.parquet(str(work / "postings"))
        .select("doc_id", "token")
        .distinct()
        .count()
    )
    assert n_postings == distinct
