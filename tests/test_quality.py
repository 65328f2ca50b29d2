"""Hand-computed cases for the Gopher quality/repetition operators."""

from __future__ import annotations

import math

from music_streaming_data_pipeline_v2_spark.operators.quality import (
    gopher_quality_rules,
    gopher_repetition,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_rules_flags_and_keep(spark):
    long_good = " ".join(["the", "and", "words"] * 20)  # 60 words, all alpha
    short = "the and tiny"  # 3 words — fails word count
    no_stop = " ".join(["zebra"] * 60)  # no required stopwords
    digits = " ".join(["the", "and"] + ["12345"] * 58)  # alpha frac 2/60
    df = _docs(
        spark,
        [(1, long_good), (2, short), (3, no_stop), (4, digits)],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_rules(df).collect()
    }
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 60
    assert math.isclose(out[1]["mean_word_len"], (3 + 3 + 5) * 20 / 60)
    assert out[1]["stopword_hits"] == 2
    assert out[2]["flag_word_count"] is False and out[2]["keep"] is False
    assert out[3]["flag_stopwords"] is False and out[3]["stopword_hits"] == 0
    assert out[4]["flag_alpha_words"] is False
    assert math.isclose(out[4]["alpha_word_frac"], 2 / 60)


def test_quality_rules_mean_word_len_bounds(spark):
    # 60 one-char words → mean_word_len 1 < 3 fails; 60 11-char words
    # → 11 > 10 fails.
    df = _docs(
        spark,
        [(1, " ".join(["a"] * 60)), (2, " ".join(["b" * 11] * 60))],
    )
    out = {r["doc_id"]: r for r in gopher_quality_rules(df).collect()}
    assert out[1]["flag_mean_word_len"] is False
    assert out[2]["flag_mean_word_len"] is False


def test_repetition_hand_case(spark):
    # grams: "a b","b a","a b","b c" → "a b"×2 dup; n_chars=9.
    df = _docs(spark, [(1, "a b a b c")])
    row = gopher_repetition(df, n=2).collect()[0]
    assert row["n_grams"] == 4
    assert math.isclose(row["dup_gram_char_frac"], 6 / 9)
    assert row["top_gram"] == "a b"
    assert math.isclose(row["top_gram_char_frac"], 6 / 9)


def test_repetition_tie_breaks_lexicographic(spark):
    # "x y"×2 and "y x"×2 tie — lexicographically smallest wins.
    df = _docs(spark, [(1, "x y x y y x")])
    row = gopher_repetition(df, n=2).collect()[0]
    assert row["top_gram"] == "x y"


def test_repetition_gramless_doc_scores_zero(spark):
    df = _docs(spark, [(1, "solo"), (2, "")])
    out = {r["doc_id"]: r for r in gopher_repetition(df, n=2).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["n_grams"] == 0
        assert r["dup_gram_char_frac"] == 0.0
        assert r["top_gram"] is None
        assert r["top_gram_char_frac"] == 0.0


def test_repetition_no_dups_zero_frac(spark):
    df = _docs(spark, [(1, "p q r s")])
    row = gopher_repetition(df, n=2).collect()[0]
    assert row["n_grams"] == 3
    assert row["dup_gram_char_frac"] == 0.0
    # every gram count 1 → top is the lexicographically smallest gram
    assert row["top_gram"] == "p q"


def test_source_ngram_overlap_hand_case(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        source_ngram_overlap,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e", "A"),
            (2, "a b c d e", "A"),  # same grams — distinct per source
            (3, "a b c d x", "B"),
            (4, "z z z z", "C"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_ngram_overlap(df, n=4).collect()
    }
    # A: {"a b c d", "b c d e"}; B: {"a b c d", "b c d x"}; C: {"z z z z"}
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert math.isclose(r["jaccard"], 1 / 3)


def test_oov_rate_hand_case(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat", "x"),
            (2, "dog bird", "x"),
            (3, "cat NEW new", "x"),
            (4, "", "x"),
        ],
        "doc_id long, text string, source string",
    )
    # vocab corpus = docs 1,2 with min_doc_freq=1 → {cat, dog, bird}
    vocab_side = docs.filter("doc_id <= 2")
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab_side, 1).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (3, 0)
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (2, 0)
    # doc 3: tokens lowercased → cat,new,new — 'new' OOV twice
    assert (out[3]["n_tokens"], out[3]["n_oov"]) == (3, 2)
    assert math.isclose(out[3]["oov_rate"], 2 / 3)
    # empty doc survives with rate 0 via the spine
    assert (out[4]["n_tokens"], out[4]["n_oov"], out[4]["oov_rate"]) == (0, 0, 0.0)


def test_oov_rate_min_doc_freq(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import oov_rate

    docs = spark.createDataFrame(
        [(1, "rare shared", "x"), (2, "shared", "x")],
        "doc_id long, text string, source string",
    )
    # min_doc_freq=2: only 'shared' qualifies; 'rare' becomes OOV
    out = {r["doc_id"]: r for r in oov_rate(docs, docs, 2).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (2, 1)
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (1, 0)


def test_vocab_coverage_curve_hand_case(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        vocab_coverage_curve,
    )

    docs = spark.createDataFrame(
        # case-folded counts: a=4, b=3, c=3, d=1 → total 11; the b/c
        # tie at 3 breaks on the token string (b first)
        [(1, "a a b C"), (2, "a b c d"), (3, "A b c")],
        "doc_id long, text string",
    )
    out = {
        r["vocab_size"]: r
        for r in vocab_coverage_curve(docs, [1, 2, 3, 10]).collect()
    }
    assert [
        (out[n]["covered_occurrences"], out[n]["total_occurrences"])
        for n in (1, 2, 3, 10)
    ] == [(4, 11), (7, 11), (10, 11), (11, 11)]
    assert math.isclose(out[2]["coverage"], 7 / 11)
    # sizes beyond the vocabulary saturate at total, never overshoot
    assert math.isclose(out[10]["coverage"], 1.0)


def test_vocab_coverage_curve_tie_break_deterministic(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        vocab_coverage_curve,
    )

    # x and y tie at 2 occurrences; z has 3 — top-2 must be {z, x}
    docs = spark.createDataFrame(
        [(1, "z z z x x y y")], "doc_id long, text string"
    )
    out = {
        r["vocab_size"]: r["covered_occurrences"]
        for r in vocab_coverage_curve(docs, [1, 2]).collect()
    }
    assert out == {1: 3, 2: 5}
