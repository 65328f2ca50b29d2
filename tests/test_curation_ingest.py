"""Curation served from incremental near-dup state ≡ the batch recipe
tail over the concatenated corpus with the same (MinHash) miner."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.clustering import (
    connected_components,
)
from music_streaming_data_pipeline_v2_spark.operators.curation import (
    curation_from_components,
)
from music_streaming_data_pipeline_v2_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from music_streaming_data_pipeline_v2_spark.streaming.curation_ingest import (
    query_curation,
)
from music_streaming_data_pipeline_v2_spark.streaming.dedup_ingest import (
    run_incremental_dedup,
)

MINER = dict(jaccard_threshold=0.5, num_hashes=16, bands=8, shingle_k=2)
BUDGET, EPOCHS = 500, 2
GATE = dict(min_tokens=4, min_uniq_permille=100)

WAVE1 = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "the quick brown fox jumps over the lazy cat"),
    (3, "en", "completely different content about spark engines"),
    (4, "en", "short"),
]
WAVE2 = [
    (10, "en", "the quick brown fox jumps over the lazy dog today"),
    (11, "de", "unrelated text about distributed query planning"),
    (12, "de", "ein anderes dokument mit eigenem inhalt und worten"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        fh.write("doc_id,lang,text\n")
        for did, lang, text in rows:
            fh.write(f"{did},{lang},{text}\n")


def _batch_twin(spark, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    pairs = minhash_lsh_pairs(docs, **MINER)
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "component"
    )
    return curation_from_components(docs, comp, BUDGET, EPOCHS, **GATE)


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_curation_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()

    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    assert _vals(
        query_curation(spark, work, BUDGET, EPOCHS, **GATE)
    ) == _vals(_batch_twin(spark, WAVE1))

    _write_wave(inp / "w2.csv", WAVE2)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    both = _batch_twin(spark, WAVE1 + WAVE2)
    got = query_curation(spark, work, BUDGET, EPOCHS, **GATE)
    assert _vals(got) == _vals(both)

    # semantic spot checks on the served result: the near-dup triple
    # {1,2,10} keeps exactly one representative; the too-short doc 4
    # fails the gate; held-out splits are never epoched
    rows = {r.doc_id: r for r in got.collect()}
    assert len({1, 2, 10} & set(rows)) == 1
    assert 4 not in rows
    for r in rows.values():
        if r.split != "train":
            assert r.repeat_count == 0


def test_incremental_curation_replay_noop(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    before = _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE))
    run_incremental_dedup(spark, str(inp), work, **MINER)
    assert _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE)) == before
