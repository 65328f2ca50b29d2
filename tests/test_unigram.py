"""Unigram-LM tokenizer (operators/unigram.py): Viterbi segmentation
verified against an INDEPENDENT brute-force reference (all 2^(n-1)
segmentations scored with exact Fractions), training determinism
across partitionings, coverage, and fertility sanity."""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.unigram import (
    unigram_seed_vocab,
    unigram_token_lengths,
    unigram_train,
    viterbi_kernel,
)


def _brute_force_best(word, vocab, total):
    """Enumerate EVERY segmentation (cut set over n-1 boundaries),
    keep those fully in-vocab, score with exact Fractions, tie-break
    (fewer pieces, lexicographically smaller piece list) — written
    independently of the DP (no shared helpers)."""
    n = len(word)
    best = None
    for k in range(n):
        for cuts in combinations(range(1, n), k):
            bounds = [0, *cuts, n]
            pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if any(p not in vocab for p in pieces):
                continue
            score = Fraction(1)
            for p in pieces:
                score *= Fraction(vocab[p], total)
            key = (-score, len(pieces), pieces)
            if best is None or key < best[0]:
                best = (key, pieces)
    return best[1] if best else None


def _dp_segment(word, vocab, total):
    """Run the production kernel on a one-word frame, lengths mode is
    not enough — recover the piece list via counts mode on a freq-1
    word and compare multisets, plus length."""
    import pandas as pd

    k = viterbi_kernel(vocab, total, "counts")
    out = list(k(iter([pd.DataFrame({"word": [word], "freq": [1]})])))
    df = out[0]
    return dict(zip(df["piece"], df["count"]))


@pytest.mark.parametrize(
    "word",
    ["abab", "banana", "aaaa", "abcde", "xxyyx", "q"],
)
def test_viterbi_matches_brute_force(word):
    vocab = {
        "a": 10, "b": 6, "c": 3, "d": 2, "e": 2, "n": 4, "x": 5,
        "y": 4, "q": 1, "ab": 8, "ba": 2, "ana": 5, "na": 6,
        "aa": 7, "xx": 3, "yy": 2, "abc": 4, "de": 5,
    }
    total = sum(vocab.values())
    want = _brute_force_best(word, vocab, total)
    got = _dp_segment(word, vocab, total)
    assert want is not None
    ref = {}
    for p in want:
        ref[p] = ref.get(p, 0) + 1
    assert got == ref


def test_viterbi_unsegmentable_word_skipped():
    import pandas as pd

    k = viterbi_kernel({"a": 1}, 1, "lengths")
    out = list(k(iter([pd.DataFrame({"word": ["zz"], "freq": [1]})])))
    assert out[0]["n_tokens"].isna().all()


def test_seed_vocab_contains_all_singles(spark):
    words = spark.createDataFrame(
        [("hello", 3), ("help", 2)], "word string, freq long"
    )
    vocab = {r["piece"]: r["count"] for r in
             unigram_seed_vocab(words, 3, 5).collect()}
    for ch in "helop":
        assert ch in vocab
    # substring occurrence counting: "l" appears twice in hello (freq
    # 3) and once in help (freq 2) -> 8
    assert vocab["l"] == 2 * 3 + 1 * 2
    assert vocab["hel"] == 5  # shared prefix, counted per word freq


def test_train_deterministic_across_partitionings(spark):
    rows = [(i, f"the banana band ran abab d{i % 7}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    v1 = unigram_train(docs, vocab_size=30, iterations=2).collect()
    v2 = unigram_train(
        docs.repartition(7), vocab_size=30, iterations=2
    ).collect()
    assert sorted(map(tuple, v1)) == sorted(map(tuple, v2))


def test_train_and_lengths_end_to_end(spark):
    rows = [(i, "banana banana bandana") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = unigram_train(docs, vocab_size=20, iterations=2)
    vd = {r["piece"]: r["count"] for r in vocab.collect()}
    # a dominant substring of the corpus survives training as a piece
    assert any(len(p) > 1 for p in vd), vd
    lengths = unigram_token_lengths(docs, vocab)
    got = {r["doc_id"]: r["n_tokens"] for r in lengths.collect()}
    assert len(got) == 10
    n = set(got.values())
    assert len(n) == 1  # identical docs tokenize identically
    # multi-char pieces exist, so fertility beats char-level: fewer
    # tokens than characters (18 non-space chars per doc)
    assert 3 <= next(iter(n)) < 18