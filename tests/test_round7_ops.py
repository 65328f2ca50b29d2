"""Round-7 operators: span-level decontamination islands, CDF score
calibration (two-phase ≡ CUME_DIST), zlib compressibility pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.quality import (
    compression_ratio,
    quantile_normalize,
)
from music_streaming_data_pipeline_v2_spark.operators.text import (
    contamination_spans,
)


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# contamination_spans
# ---------------------------------------------------------------------------


def test_contamination_spans_islands(spark):
    """Hand-checkable island algebra at n=2: overlapping and touching
    gram intervals merge, a gap > n splits, span = last−first+n."""
    # train knows the bigrams of "a b", "b c", "x y"
    train = spark.createDataFrame(
        [(100, "a b c"), (101, "x y")], "doc_id long, text string"
    )
    # test doc 1 tokens: a b c q q x y z x y
    #   matched bigram starts (0-based): "a b"@0, "b c"@1, "x y"@5, "x y"@8
    #   islands at n=2: {0,1} (gap 1), {5} vs 8 → gap 3 > 2 splits
    #   spans: [0..2] len 3, [5..6] len 2, [8..9] len 2
    test = spark.createDataFrame(
        [(1, "a b c q q x y z x y"), (2, "q q q")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_spans(train, test, n=2).collect()}
    assert set(out) == {1}  # doc 2 clean → absent
    assert out[1]["n_spans"] == 3
    assert out[1]["longest_span"] == 3
    assert out[1]["covered_tokens"] == 7

    # touching intervals (gap exactly n) merge into ONE span
    train2 = spark.createDataFrame(
        [(200, "a b"), (201, "c d")], "doc_id long, text string"
    )
    test2 = spark.createDataFrame(
        [(3, "a b c d")], "doc_id long, text string"
    )
    r = contamination_spans(train2, test2, n=2).first()
    assert (r["n_spans"], r["longest_span"], r["covered_tokens"]) == (1, 4, 4)


def test_contamination_spans_whole_doc_covered(spark):
    """A test doc fully contained in train is one doc-length span."""
    train = spark.createDataFrame(
        [(10, "u v w x y z")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(1, "u v w x y z")], "doc_id long, text string"
    )
    r = contamination_spans(train, test, n=3).first()
    assert (r["n_spans"], r["longest_span"], r["covered_tokens"]) == (1, 6, 6)


def test_contamination_spans_partitioning_invariant(spark):
    train = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}") for i in range(30)],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100 + i, f"tok{3*i} tok{3*i+1} tok{3*i+2} zz{i}") for i in range(10)],
        "doc_id long, text string",
    )
    a = _vals(contamination_spans(train, test, n=3))
    b = _vals(contamination_spans(train.repartition(7), test.repartition(3), n=3))
    assert a == b and a


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_equals_cume_dist(spark):
    """The two-phase value-relation form ≡ the group-sized CUME_DIST
    window it avoids — ties, negative scores, and a null score (NULLS
    FIRST in ascending order) all included."""
    rows = [
        (1, "a", 10), (2, "a", 10), (3, "a", 20), (4, "a", None),
        (5, "b", -5), (6, "b", 0), (7, "b", 0), (8, "b", 7), (9, "b", 7),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score int")
    got = _vals(
        quantile_normalize(df, "score", group_col="grp").select(
            "id", "pct"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("score").asc_nulls_first())
    want = _vals(df.select("id", F.cume_dist().over(w).alias("pct")))
    assert got == want


def test_quantile_normalize_ungrouped_and_row_preserving(spark):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "id long, score int"
    )
    out = quantile_normalize(df, "score")
    assert out.count() == 40
    by_score = {
        r["score"]: r["pct"]
        for r in out.select("score", "pct").distinct().collect()
    }
    # score s has 10 rows each; cume_dist(s) = 10*(s+1)/40
    for s in range(4):
        assert by_score[s] == pytest.approx(10 * (s + 1) / 40, abs=0)


# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------


def test_compression_ratio_pins_and_invariance(spark):
    """zlib at a fixed level is deterministic: pin reference values
    computed independently with the stdlib here in the test, check
    null/empty handling, and partitioning invariance — the rows-only
    registry entry's substitute for a DuckDB oracle.

    The pins compare the KERNEL's output against this test process's
    own stdlib zlib — valid because driver and executors share one
    Python in this container. Cross-build caveat (exact encoder bytes
    are per zlib build, not per DEFLATE spec — see the operator
    docstring): the runtime version is asserted present so a container
    change that swaps zlib surfaces here, not as silent pin drift."""
    import zlib

    assert isinstance(zlib.ZLIB_RUNTIME_VERSION, str)
    assert zlib.ZLIB_RUNTIME_VERSION

    texts = [
        (0, "spam spam spam spam spam spam spam spam"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, None),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for did, t in texts:
        if t is None:
            assert out[did]["n_raw_bytes"] is None
            assert out[did]["ratio"] is None
            continue
        b = t.encode()
        assert out[did]["n_raw_bytes"] == len(b)
        assert out[did]["n_compressed_bytes"] == len(zlib.compress(b, 6))
        if b:
            assert out[did]["ratio"] == len(zlib.compress(b, 6)) / len(b)
        else:
            assert out[did]["ratio"] is None
    # repetitive text compresses materially better than prose
    assert out[0]["ratio"] < out[1]["ratio"]
    a = _vals(compression_ratio(df))
    b2 = _vals(compression_ratio(df.repartition(5)))
    assert a == b2


# ---------------------------------------------------------------------------
# ngram_clipped_precision
# ---------------------------------------------------------------------------


def test_clipped_precision_hand_checked(spark):
    """BLEU §2.1's own clipping example plus a bigram case: 'the the
    the the the the the' vs 'the cat is on the mat' → p1 = 2/7 (count
    clipped at the reference's 2), p2 = 0/6."""
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        ngram_clipped_precision,
    )

    pairs = spark.createDataFrame(
        [
            (1, "the the the the the the the", "the cat is on the mat"),
            (2, "a b c", "a b c"),
            (3, "x", "y z"),
        ],
        "pair_id long, cand string, ref string",
    )
    out = {r["pair_id"]: r for r in ngram_clipped_precision(pairs, n=2).collect()}
    r1 = out[1]
    assert (r1["matched_1"], r1["total_1"]) == (2, 7)
    assert r1["p_1"] == 2 / 7
    assert (r1["matched_2"], r1["total_2"], r1["p_2"]) == (0, 6, 0.0)
    assert (r1["len_cand"], r1["len_ref"]) == (7, 6)
    r2 = out[2]  # identical → perfect precision at both orders
    assert (r2["p_1"], r2["p_2"]) == (1.0, 1.0)
    r3 = out[3]  # single token: no bigrams → p_2 NULL, p_1 = 0
    assert (r3["matched_1"], r3["total_1"], r3["p_1"]) == (0, 1, 0.0)
    assert (r3["matched_2"], r3["total_2"], r3["p_2"]) == (0, 0, None)


def test_clipped_precision_partitioning_invariant(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        ngram_clipped_precision,
    )

    pairs = spark.createDataFrame(
        [
            (i, f"w{i} w{i+1} w{i} shared tail", f"w{i} shared tail w{9-i}")
            for i in range(10)
        ],
        "pair_id long, cand string, ref string",
    )
    a = _vals(ngram_clipped_precision(pairs, n=2))
    b = _vals(ngram_clipped_precision(pairs.repartition(7), n=2))
    assert a == b and a


# ---------------------------------------------------------------------------
# decayed_sum
# ---------------------------------------------------------------------------


def test_decayed_sum_exact_weights_and_clamps(spark):
    """Power-of-two decay, hand-checkable: ages 0/7/14 days at a 7-day
    half-life weight 1, 1/2, 1/4; future timestamps and events past
    the cap contribute 0 (but still appear in the group); NULL values
    skipped."""
    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        decayed_sum,
    )

    rows = [
        (1, "play", "2024-02-01 10:00:00", 8.0),   # age 0  → w 1
        (2, "play", "2024-01-25 10:00:00", 8.0),   # age 7  → w 1/2
        (3, "play", "2024-01-18 10:00:00", 8.0),   # age 14 → w 1/4
        (4, "play", "2024-02-05 10:00:00", 100.0), # future → 0
        (5, "play", "2020-01-01 10:00:00", 100.0), # past cap → 0
        (6, "play", "2024-02-01 11:00:00", None),  # NULL value
        (7, "skip", "2024-01-25 09:00:00", 2.0),   # other group, w 1/2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_type"]: r
        for r in decayed_sum(
            df,
            ["event_type"],
            "ts",
            "value",
            "2024-02-02",
            half_life_days=7,
            cap_periods=8,
        ).collect()
    }
    # ages vs 2024-02-02: 1, 8, 15 days → k = 0, 1, 2
    assert out["play"]["n_events"] == 3
    assert out["play"]["decayed_value"] == 8.0 + 4.0 + 2.0
    assert out["skip"]["decayed_value"] == 1.0
    a = _vals(
        decayed_sum(df, ["event_type"], "ts", "value", "2024-02-02")
    )
    b = _vals(
        decayed_sum(
            df.repartition(5), ["event_type"], "ts", "value", "2024-02-02"
        )
    )
    assert a == b


def test_decayed_from_cells_equals_rows(spark):
    """Dated additive cells serve the decayed readout exactly: split
    the events into two disjoint 'batches', sum their cells, and the
    cell-served decayed values equal the row-level decayed_sum —
    including groups whose n_events differs from their row count via
    out-of-window days, with a NULL-value row excluded in both."""
    import random

    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        decayed_from_cells,
        decayed_sum,
        value_day_cells,
    )

    rng = random.Random(7)
    rows = [
        (
            i,
            f"t{i % 3}",
            f"2024-01-{1 + rng.randrange(30):02d} "
            f"{rng.randrange(24):02d}:00:00",
            None if i % 17 == 0 else round(rng.uniform(0.01, 400.0), 2),
        )
        for i in range(400)
    ]
    # a group whose rows are ALL NULL-valued: decayed_sum keeps it
    # (n_events=0, value 0.0) and the cells path must too — its cells
    # are zero-count markers (ADVICE r7 roster finding)
    rows += [
        (1000 + i, "tallnull", f"2024-01-{10 + i:02d} 01:00:00", None)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = _vals(
        decayed_sum(df, ["event_type"], "ts", "value", "2024-01-20")
    )
    b1 = df.filter(F.col("event_id") % 2 == 0)
    b2 = df.filter(F.col("event_id") % 2 == 1)
    merged = (
        value_day_cells(b1, ["event_type"], "ts", "value")
        .unionByName(value_day_cells(b2, ["event_type"], "ts", "value"))
        .groupBy("event_type", "_day")
        .agg(F.sum("_n").alias("_n"), F.sum("_vc").alias("_vc"))
    )
    got = _vals(decayed_from_cells(merged, ["event_type"], "2024-01-20"))
    assert got == want


def test_decayed_sum_rejects_overflowing_cap(spark):
    from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
        decayed_from_cells,
        decayed_sum,
    )

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", 1.0)],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="cap_periods <= 40"):
        decayed_sum(
            df, ["event_type"], "ts", "value", "2024-02-01", cap_periods=41
        )
    cells = spark.createDataFrame(
        [("a", "2024-01-01", 1, 100)], "event_type string, _day string, _n long, _vc long"
    ).withColumn("_day", F.col("_day").cast("date"))
    with pytest.raises(ValueError, match="cap_periods <= 40"):
        decayed_from_cells(cells, ["event_type"], "2024-02-01", cap_periods=62)
