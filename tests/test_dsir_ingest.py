"""DSIR-at-ingest: incremental state ≡ batch dsir_importance over the
same documents; replays are no-ops; scores shift exactly when the raw
distribution grows."""

from __future__ import annotations

import json

from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    dsir_importance,
)
from music_streaming_data_pipeline_v2_spark.streaming.dsir_ingest import (
    query_dsir_scores,
    run_incremental_dsir,
)

DOCS_W1 = [
    (0, "the quick brown fox jumps"),
    (1, "lorem ipsum dolor sit amet"),
    (2, "quick brown quick brown"),
]
DOCS_W2 = [
    (10, "the lazy dog sleeps"),
    (11, "entirely different vocabulary here"),
]

TARGET = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "a quick brown dog"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text in rows:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")


def _target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def _scores(df):
    return sorted((r.doc_id, r.n_feats, r.log_weight) for r in df.collect())


def test_incremental_dsir_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_dsir(spark, str(inp), str(work))
    got1 = _scores(query_dsir_scores(spark, str(work), _target(spark)))
    raw1 = spark.createDataFrame(DOCS_W1, "doc_id long, text string")
    want1 = _scores(dsir_importance(raw1, _target(spark)))
    assert got1 == want1

    # wave 2: history is NOT re-featurized, yet every score shifts
    # exactly as if the whole pool were re-scored (p_raw moved)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_dsir(spark, str(inp), str(work))
    got2 = _scores(query_dsir_scores(spark, str(work), _target(spark)))
    raw2 = spark.createDataFrame(
        DOCS_W1 + DOCS_W2, "doc_id long, text string"
    )
    want2 = _scores(dsir_importance(raw2, _target(spark)))
    assert got2 == want2
    assert dict(
        (d, w) for d, _, w in got1
    ) != dict((d, w) for d, _, w in got2 if d < 10)  # old docs re-scored

    # replay with no new files: state unchanged, results unchanged
    run_incremental_dsir(spark, str(inp), str(work))
    assert _scores(query_dsir_scores(spark, str(work), _target(spark))) == got2
    # no duplicate state rows from the replay
    db = spark.read.parquet(str(work / "docbuckets"))
    assert db.count() == db.select("doc_id", "bkt").distinct().count()


def test_incremental_dsir_target_like_docs_win(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", DOCS_W1 + DOCS_W2)
    run_incremental_dsir(spark, str(inp), str(work))
    w = {
        r.doc_id: r.log_weight
        for r in query_dsir_scores(spark, str(work), _target(spark)).collect()
    }
    # doc 0 shares the target's vocabulary; doc 1 is lorem-ipsum noise
    assert w[0] > w[1]


def test_query_before_any_drain_is_empty_not_crash(spark, tmp_path):
    from music_streaming_data_pipeline_v2_spark.streaming.index_ingest import (
        query_index,
    )

    out = query_dsir_scores(spark, str(tmp_path / "nowhere"), _target(spark))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_feats",
        "log_weight",
    ]
    probe = spark.createDataFrame([(0, "x")], "query_id int, text string")
    idx = query_index(spark, str(tmp_path / "nowhere2"), probe)
    assert idx.count() == 0
