"""epoch_mix_plan: budget invariants and edges."""

from __future__ import annotations

from music_streaming_data_pipeline_v2_spark.operators.sampling import epoch_mix_plan


def _mix(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return epoch_mix_plan(df, tokens_per_source=budget).collect()


def test_budget_invariant_per_source(spark):
    # source A: 3 docs x 4 tokens = 12; budget 30 → whole=2, rem=6 →
    # extra pass covers a hash-ordered prefix totalling >= 6 tokens.
    rows = [
        (1, "a b c d", "A"),
        (2, "e f g h", "A"),
        (3, "i j k l", "A"),
        (4, "m n", "B"),  # B: 2 tokens; budget 30 → whole=15, rem=0
    ]
    out = _mix(spark, rows, 30)
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    a_total = sum(r["n_tokens"] * r["repeat_count"] for r in by_src["A"])
    max_a = max(r["n_tokens"] for r in by_src["A"])
    assert 30 <= a_total < 30 + max_a
    assert all(r["repeat_count"] >= 2 for r in by_src["A"])  # whole epochs
    assert [r["repeat_count"] for r in by_src["B"]] == [15, 15][: len(by_src["B"])]
    b_total = sum(r["n_tokens"] * r["repeat_count"] for r in by_src["B"])
    assert b_total == 30


def test_zero_token_source_and_small_budget(spark):
    rows = [(1, "", "E"), (2, "x y z w v", "F")]
    out = {r["doc_id"]: r for r in _mix(spark, rows, 3)}
    assert out[1]["repeat_count"] == 0  # zero-token source: guard, no div
    # F: 5 tokens > budget 3 → whole=0, remainder pass selects the one
    # doc (cum_before 0 < 3)
    assert out[2]["repeat_count"] == 1


def test_deterministic_across_partitionings(spark):
    rows = [(i, " ".join(["t"] * (3 + i % 5)), f"S{i % 3}") for i in range(60)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(
        map(tuple, epoch_mix_plan(df1, 100).collect())
    )
    b = sorted(
        map(
            tuple,
            epoch_mix_plan(df1.repartition(13), 100).collect(),
        )
    )
    assert a == b


def test_unimax_hand_case_both_branches(spark):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        unimax_plan,
    )

    # tokens: tiny=2, small=4, big=10; caps ×2 → 4, 8, 20 (sum 32)
    docs = spark.createDataFrame(
        [
            (1, "t1 t2", "tiny"),
            (2, "s1 s2 s3 s4", "small"),
            (3, " ".join(f"b{i}" for i in range(10)), "big"),
        ],
        "doc_id long, text string, source string",
    )
    # B=15: f(1)=4*3=12 ≤ 15 → tiny capped; f(2)=4+8*2=20 > 15 →
    # small/big uncapped, R=11 over 2 → 6 and 5 (first ascending +1)
    out = {
        r["source"]: r for r in unimax_plan(docs, 15, 2).collect()
    }
    assert (out["tiny"]["alloc_tokens"], out["tiny"]["capped"]) == (4, True)
    assert (out["small"]["alloc_tokens"], out["small"]["capped"]) == (6, False)
    assert (out["big"]["alloc_tokens"], out["big"]["capped"]) == (5, False)
    assert sum(r["alloc_tokens"] for r in out.values()) == 15

    # budget above every cap: everyone capped, surplus unallocated
    out2 = {r["source"]: r for r in unimax_plan(docs, 100, 2).collect()}
    assert all(r["capped"] for r in out2.values())
    assert sum(r["alloc_tokens"] for r in out2.values()) == 32


def test_unimax_conservation_and_caps_fuzz(spark):
    """sum(alloc) = min(B, Σcap) and alloc ≤ cap, across budgets that
    sweep the capped prefix from empty to full."""
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        unimax_plan,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}_{j}" for j in range(n)), f"s{i}")
            for i, n in enumerate([1, 3, 3, 7, 20, 55])
        ],
        "doc_id long, text string, source string",
    )
    cap_sum = (1 + 3 + 3 + 7 + 20 + 55) * 3
    for budget in (0, 1, 5, 17, 50, 120, cap_sum - 1, cap_sum, cap_sum + 9):
        rows = unimax_plan(docs, budget, 3).collect()
        assert all(r["alloc_tokens"] <= r["cap_tokens"] for r in rows), budget
        assert all(r["alloc_tokens"] >= 0 for r in rows), budget
        assert sum(r["alloc_tokens"] for r in rows) == min(budget, cap_sum), (
            budget
        )


def test_epoch_mix_budgets_mode(spark):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        epoch_mix_plan,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "x"),
            (2, "d e", "x"),
            (3, "f g h i", "y"),
        ],
        "doc_id long, text string, source string",
    )
    # per-source budgets equal to one scalar ≡ the scalar mode
    budgets = spark.createDataFrame(
        [("x", 12), ("y", 12)], "source string, budget_tokens long"
    )
    got = sorted(
        tuple(r) for r in epoch_mix_plan(docs, budgets=budgets).collect()
    )
    want = sorted(
        tuple(r) for r in epoch_mix_plan(docs, 12).collect()
    )
    assert got == want

    # a source missing from budgets gets budget 0 → repeat 0; others
    # unaffected
    partial = spark.createDataFrame(
        [("y", 8)], "source string, budget_tokens long"
    )
    out = {
        r["doc_id"]: r["repeat_count"]
        for r in epoch_mix_plan(docs, budgets=partial).collect()
    }
    assert out[1] == 0 and out[2] == 0
    assert out[3] == 2  # 8 DIV 4 = 2 whole epochs, remainder 0

    import pytest

    with pytest.raises(ValueError):
        epoch_mix_plan(docs)
    with pytest.raises(ValueError):
        epoch_mix_plan(docs, 12, budgets=partial)
