"""Incremental vocabulary cells at ingest ≡ batch vocabulary /
coverage curve over the same documents; replays are no-ops."""

from __future__ import annotations

import json

from music_streaming_data_pipeline_v2_spark.operators.quality import (
    corpus_vocabulary,
    vocab_coverage_curve,
)
from music_streaming_data_pipeline_v2_spark.streaming.vocab_ingest import (
    query_coverage_curve,
    query_vocabulary,
    run_incremental_vocab,
)

DOCS_W1 = [
    (0, "Apple banana apple", "a"),
    (1, "banana cherry", "a"),
    (2, "apple date", "b"),
]
DOCS_W2 = [
    (10, "cherry CHERRY apple", "c"),
    (11, "elderberry banana", "c"),
]

SIZES = [1, 2, 3, 100]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text, src in rows:
            fh.write(
                json.dumps({"doc_id": did, "text": text, "source": src})
                + "\n"
            )


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_vocab_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_vocab(spark, str(inp), str(work))
    for k in (1, 2):
        assert _vals(query_vocabulary(spark, str(work), k)) == _vals(
            corpus_vocabulary(_df(spark, DOCS_W1), k)
        )
    assert _vals(query_coverage_curve(spark, str(work), SIZES)) == _vals(
        vocab_coverage_curve(_df(spark, DOCS_W1), SIZES)
    )

    # wave 2: history never re-tokenized; a token's doc-frequency
    # crosses the min_doc_freq threshold via cross-wave cell addition
    # (cherry: 1 doc in w1 + 1 in w2 → enters the k=2 vocabulary)
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_vocab(spark, str(inp), str(work))
    both = DOCS_W1 + DOCS_W2
    got_v2 = _vals(query_vocabulary(spark, str(work), 2))
    assert got_v2 == _vals(corpus_vocabulary(_df(spark, both), 2))
    assert ("cherry",) in got_v2
    assert _vals(query_coverage_curve(spark, str(work), SIZES)) == _vals(
        vocab_coverage_curve(_df(spark, both), SIZES)
    )

    # replay with no new files: state unchanged, results unchanged
    run_incremental_vocab(spark, str(inp), str(work))
    assert _vals(query_vocabulary(spark, str(work), 2)) == got_v2


def test_query_before_any_drain_is_empty_vocab_zero_curve(spark, tmp_path):
    work = str(tmp_path / "nothing")
    assert query_vocabulary(spark, work, 1).count() == 0
    rows = {
        r["vocab_size"]: r
        for r in query_coverage_curve(spark, work, [1, 4]).collect()
    }
    assert set(rows) == {1, 4}
    assert all(
        (r["covered_occurrences"], r["total_occurrences"], r["coverage"])
        == (0, 0, 0.0)
        for r in rows.values()
    )


def test_bpe_from_state_equals_batch_on_lowered_corpus(spark, tmp_path):
    """Tokenizer retrain from accumulated cells ≡ batch bpe_merges on
    the lowercased concatenation of every drained wave — the corpus is
    never re-read, yet the merge table is identical."""
    from pyspark.sql import functions as F

    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.vocab_ingest import (
        query_bpe_merges,
    )

    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_vocab(spark, str(inp), str(work))
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_vocab(spark, str(inp), str(work))

    batch = bpe_merges(
        _df(spark, DOCS_W1 + DOCS_W2).withColumn("text", F.lower("text")),
        k=4,
    )[0]
    assert _vals(query_bpe_merges(spark, str(work), k=4)) == _vals(batch)


def test_unigram_from_state_equals_batch_on_lowered_corpus(spark, tmp_path):
    """Unigram retrain from accumulated cells ≡ batch unigram_train on
    the lowercased concatenation of every drained wave — the
    query_bpe_merges contract for the third trainer."""
    from music_streaming_data_pipeline_v2_spark.operators.unigram import (
        unigram_train,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.vocab_ingest import (
        query_unigram_vocab,
    )

    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_vocab(spark, str(inp), str(work))
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_vocab(spark, str(inp), str(work))

    batch = unigram_train(
        _df(spark, DOCS_W1 + DOCS_W2), vocab_size=30, iterations=2
    )
    got = query_unigram_vocab(
        spark, str(work), vocab_size=30, iterations=2
    )
    assert _vals(got) == _vals(batch)


def test_phrase_gate_from_state(spark, tmp_path):
    """phrase_blocklist_join fed the ingest state's dfreq relation ≡
    the default (per-call corpus aggregation) — the anchor-invariance
    contract that makes VERDICT r6 task #3's per-batch gate exact even
    though the state tokenizes with engine_safe_tokens while the gate
    splits on whitespace. Also proves staleness-safety: wave-1-only
    statistics gate the wave-1+2 corpus identically."""
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        phrase_blocklist_join,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.vocab_ingest import (
        query_phrase_dfreq,
    )

    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    phrases = spark.createDataFrame(
        [("apple banana",), ("cherry apple",), ("elderberry banana",)],
        "phrase string",
    )

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_vocab(spark, str(inp), str(work))
    corpus = _df(spark, DOCS_W1)
    batch = _vals(
        phrase_blocklist_join(corpus, phrases).select(
            "doc_id", "n_blocked_phrases", "keep"
        )
    )
    fed = _vals(
        phrase_blocklist_join(
            corpus, phrases, dfreq=query_phrase_dfreq(spark, str(work))
        ).select("doc_id", "n_blocked_phrases", "keep")
    )
    assert fed == batch
    assert any(n > 0 for _, n, _ in batch)  # the gate actually fires

    # wave 2 lands; gate the GROWN corpus with the STALE wave-1 state
    # (what a per-batch pipeline does between state refreshes) and
    # with the refreshed state — both must equal the batch answer
    both = _df(spark, DOCS_W1 + DOCS_W2)
    batch2 = _vals(
        phrase_blocklist_join(both, phrases).select(
            "doc_id", "n_blocked_phrases", "keep"
        )
    )
    stale = _vals(
        phrase_blocklist_join(
            both, phrases, dfreq=query_phrase_dfreq(spark, str(work))
        ).select("doc_id", "n_blocked_phrases", "keep")
    )
    assert stale == batch2
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_vocab(spark, str(inp), str(work))
    fresh = _vals(
        phrase_blocklist_join(
            both, phrases, dfreq=query_phrase_dfreq(spark, str(work))
        ).select("doc_id", "n_blocked_phrases", "keep")
    )
    assert fresh == batch2
