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
