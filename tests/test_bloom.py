"""Bloom prefilter properties: sizing, no-false-negatives, and the
prefilter+exact-verify ≡ exact-join equivalence that makes
`bloom_decontamination` oracle-checkable."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
    optimal_num_bits,
    optimal_num_hashes,
    with_bloom_contains,
)


def test_sizing_formulas():
    # 1000 items at 1% fpp: the textbook optimum is ~9585 bits / 7 hashes
    m = optimal_num_bits(1000, 0.01)
    assert 9000 < m < 10500
    assert optimal_num_hashes(m, 1000) == 7
    # degenerate inputs stay sane
    assert optimal_num_bits(0) == 64
    assert optimal_num_hashes(64, 0) == 1
    assert 1 <= optimal_num_hashes(10**9, 1) <= 16


def test_no_false_negatives_and_membership(spark):
    vals = spark.range(2000).selectExpr("concat('v', id) s")
    m = optimal_num_bits(2000, 0.01)
    k = optimal_num_hashes(m, 2000)
    words = build_bloom(vals, "s", m, k)
    assert len(words) == (m + 63) // 64
    # every inserted value MUST probe positive
    hits = with_bloom_contains(vals, "s", words, m, k)
    assert hits.filter(~F.col("_bloom_hit")).count() == 0
    # fpp on disjoint values is near the configured 1% (loose bound)
    other = spark.range(5000).selectExpr("concat('x', id) s")
    fp = (
        with_bloom_contains(other, "s", words, m, k)
        .filter(F.col("_bloom_hit"))
        .count()
    )
    assert fp / 5000 < 0.05


def test_prefilter_plus_exact_equals_exact_join(spark):
    # overlapping id spaces: 1000 of big's 10000 distinct keys are in small
    big = spark.range(30000).selectExpr("concat('k', id % 10000) s", "id")
    small = spark.range(1000).selectExpr("concat('k', id * 7 % 10000) s")
    pre = bloom_prefilter(big, small, "s", fpp=0.01)
    exact = big.join(small.distinct(), "s", "left_semi")
    via_bloom = pre.join(small.distinct(), "s", "left_semi")
    assert via_bloom.exceptAll(exact).count() == 0
    assert exact.exceptAll(via_bloom).count() == 0
    # and the prefilter actually cut the big side (candidate << input)
    assert pre.count() < 30000


def test_prefilter_probe_is_shuffle_free(spark):
    """The probe must never shuffle the big side: the only join is the
    one-row BroadcastNestedLoopJoin carrying the filter words, and the
    only exchange is its broadcast — no hash/range repartitioning of
    the probed relation."""
    big = spark.range(1000).selectExpr("concat('k', id) s")
    small = spark.range(100).selectExpr("concat('k', id) s")
    pre = bloom_prefilter(big, small, "s", fpp=0.01, n_items=100)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_decontamination_bloom_matches_exact(spark):
    from music_streaming_data_pipeline_v2_spark.io.sources import load_table
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        hash_bucket,
    )
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        ngram_contamination,
        ngram_contamination_bloom,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b = hash_bucket("doc_id")
    train, test = docs.filter(b < 204), docs.filter(b >= 230)
    exact = ngram_contamination(train, test, n=5)
    bloomed = ngram_contamination_bloom(train, test, n=5, strategy="bloom")
    want = sorted(map(tuple, exact.collect()))
    assert want == sorted(map(tuple, bloomed.collect()))

    # strategy equivalence: every branch of the cost switch returns the
    # same rows, and 'auto' resolves to a real branch at any threshold
    import music_streaming_data_pipeline_v2_spark.operators.text as text_mod
    import pytest

    plain = ngram_contamination_bloom(train, test, n=5, strategy="plain")
    assert want == sorted(map(tuple, plain.collect()))
    for forced_min in (0, 1 << 60):  # auto→bloom, auto→plain
        orig = text_mod._BLOOM_MIN_TRAIN_BYTES
        text_mod._BLOOM_MIN_TRAIN_BYTES = forced_min
        try:
            auto = ngram_contamination_bloom(train, test, n=5)
        finally:
            text_mod._BLOOM_MIN_TRAIN_BYTES = orig
        assert want == sorted(map(tuple, auto.collect()))
    with pytest.raises(ValueError, match="strategy"):
        ngram_contamination_bloom(train, test, n=5, strategy="nope")


def test_build_shuffle_bounded_by_filter_size(spark):
    """The build's aggregate output is ≤ m/64 rows regardless of input
    row count — the property that keeps the build scalable."""
    vals = spark.range(50000).selectExpr("concat('v', id % 500) s")
    m, k = 1024, 3
    words = build_bloom(vals, "s", m, k)
    assert len(words) == 16
    # 500 distinct × 3 probes can set at most 1500 bits
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) <= 1500
    assert math.isfinite(sum(words))


def test_bloom_contains_tolerates_colliding_column_names(spark):
    """A caller frame already carrying _bf_words / _bloom_hit must not
    break the probe join (ADVICE r4): internal names are uniquified,
    and an occupied out_col is an explicit error, not a silent
    overwrite."""
    import pytest

    df = spark.createDataFrame(
        [("a", 1, False), ("b", 2, True)],
        "k string, _bf_words int, _bloom_hit boolean",
    )
    words = build_bloom(
        spark.createDataFrame([("a",)], "k string"), "k", 128, 3
    )
    out = with_bloom_contains(df, "k", words, 128, 3, out_col="hit")
    got = {r.k: r.hit for r in out.collect()}
    assert got["a"] is True  # no false negatives
    assert set(out.columns) == {"k", "_bf_words", "_bloom_hit", "hit"}
    # caller columns pass through untouched
    assert {r.k: r._bf_words for r in out.collect()} == {"a": 1, "b": 2}

    with pytest.raises(ValueError, match="out_col"):
        with_bloom_contains(df, "k", words, 128, 3)  # default occupied


def test_bloom_prefilter_tolerates_existing_hit_column(spark):
    big = spark.createDataFrame(
        [("a", True), ("b", False), ("c", True)], "k string, _bloom_hit boolean"
    )
    small = spark.createDataFrame([("a",), ("c",)], "k string")
    out = bloom_prefilter(big, small, "k")
    assert {r.k for r in out.collect()} >= {"a", "c"}
    assert set(out.columns) == {"k", "_bloom_hit"}
