"""Unit tests for round-3 curation operators: chunking, packing,
n-gram decontamination, balanced sampling. (Cross-engine value
exactness is covered by tests/test_oracle_parity.py; these pin the
operator semantics on hand-built corpora.)"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from music_streaming_data_pipeline_v2_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    balanced_sample,
)
from music_streaming_data_pipeline_v2_spark.operators.text import (
    ngram_contamination,
)


def test_chunk_documents_overlap_and_coverage(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),
            Row(doc_id=2, text="a b"),   # shorter than overlap → 1 chunk
            Row(doc_id=3, text="   "),   # whitespace-only → 1 empty chunk
        ]
    )
    out = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_documents(docs, chunk_tokens=6, overlap=2).collect()
    }
    # doc 1: stride 4, starts 0 and 4 (start<=n-overlap-1=7)
    assert (1, 0) in out and (1, 1) in out and (1, 2) not in out
    assert out[(1, 0)].chunk_text == "w0 w1 w2 w3 w4 w5"
    assert out[(1, 1)].chunk_text == "w4 w5 w6 w7 w8 w9"
    # consecutive chunks overlap by exactly `overlap` tokens
    assert out[(1, 0)].chunk_text.split()[-2:] == out[(1, 1)].chunk_text.split()[:2]
    assert out[(2, 0)].n_chunk_tokens == 2
    assert out[(3, 0)].n_chunk_tokens == 0 and out[(3, 0)].chunk_text == ""
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_sequences_bin_assignment(spark):
    docs = spark.createDataFrame(
        [Row(source="s", doc_id=i, text=" ".join(["t"] * 30)) for i in range(5)]
    )
    out = {r.doc_id: r for r in pack_sequences(docs, budget=64).collect()}
    # cumulative starts: 0,30,60,90,120 → bins 0,0,0,1,1
    assert [out[i].bin_id for i in range(5)] == [0, 0, 0, 1, 1]
    assert [out[i].bin_offset for i in range(5)] == [0, 30, 60, 26, 56]
    assert all(out[i].n_tokens == 30 for i in range(5))


def test_ngram_contamination_hits_and_cap(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over"),
            Row(doc_id=2, text="the quick brown fox sleeps"),
            Row(doc_id=3, text="completely unrelated training text here"),
        ]
    )
    test = spark.createDataFrame(
        [
            Row(doc_id=10, text="the quick brown fox appears"),  # shares 1 4-gram w/ 2 docs
            Row(doc_id=11, text="nothing in common at all"),
        ]
    )
    got = {r.doc_id: r for r in ngram_contamination(train, test, n=4).collect()}
    assert set(got) == {10}
    assert got[10].n_shared_grams == 1
    assert got[10].n_train_docs_hit == 2
    # df cap 1 drops the gram shared by two training docs
    capped = ngram_contamination(train, test, n=4, max_gram_df=1).collect()
    assert capped == []


def test_balanced_sample_downsamples_majority_stratum(spark):
    docs = spark.createDataFrame(
        [Row(source="big", doc_id=i, text="x") for i in range(400)]
        + [Row(source="small", doc_id=i + 1000, text="x") for i in range(40)]
    )
    out = balanced_sample(docs, "source", "doc_id")
    counts = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # small stratum keeps everything (frac = 1), big shrinks toward 40
    assert counts["small"] == 40
    assert 15 <= counts["big"] <= 80  # hash-threshold ≈ expected 40
    # deterministic: same input → identical sample
    again = {r.doc_id for r in balanced_sample(docs, "source", "doc_id").collect()}
    assert again == {r.doc_id for r in out.collect()}


def test_winnow_guarantee_and_short_docs(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro words here {shared} closing remarks"),
            Row(doc_id=2, text=f"{shared} totally different tail content now"),
            Row(doc_id=3, text="just five little tokens here"),  # < w+k-1=6
            Row(doc_id=4, text=f"intro words here {shared} closing remarks"),
        ]
    )
    out = winnow_fingerprints(docs, k=3, window=4)
    sk = {}
    for r in out.collect():
        sk.setdefault(r.doc_id, set()).add(r.fp)
    # winnowing guarantee: >= (window+k-1)-token overlap → shared fp
    assert sk[1] & sk[2]
    # identical docs → identical sketches
    assert sk[1] == sk[4]
    # doc 3 has 5 tokens: grams exist (3) but no complete 4-window
    assert 3 not in sk


def test_spend_rank_analytics_has_no_global_window(spark):
    """The two-phase global ranking must never fall back to an
    un-partitioned window (single-task total order): every WindowExec
    in the physical plan has to be partitioned by the physical
    partition id, and the result must still be a correct global
    ranking (positions 1..n exactly once)."""
    from music_streaming_data_pipeline_v2_spark.plans.round3_queries import (
        spend_rank_analytics,
    )

    out = spend_rank_analytics(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window " in ln]
    assert windows, "expected the local ranking window in the plan"
    for ln in windows:
        assert "_pid" in ln, f"un-partitioned (single-task) window: {ln}"

    rows = out.collect()
    n = len(rows)
    # global positions reconstructed from cume = pos/n are a permutation
    positions = sorted(round(r.cume * n) for r in rows)
    assert positions == list(range(1, n + 1))
    # quartile bucket sizes follow the NTILE contract
    from collections import Counter

    sizes = Counter(r.quartile for r in rows)
    q, rem = divmod(n, 4)
    expected = {i + 1: q + (1 if i < rem else 0) for i in range(4) if q + (1 if i < rem else 0) > 0}
    assert dict(sizes) == expected
