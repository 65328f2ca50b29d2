"""Round-9 operators: Benford verdict gate (fabricated data trips it,
Benford-distributed data passes), Deequ-style column profile, 2-D
Pareto skyline vs a brute-force reference, and the fences-only MAD
helper ≡ the full readout's fences."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
    mad_fences_from_counts,
    mad_from_counts,
    value_cells,
)
from music_streaming_data_pipeline_v2_spark.operators.quality import (
    benford_source_gate,
)
from music_streaming_data_pipeline_v2_spark.operators.topk import skyline_2d
from music_streaming_data_pipeline_v2_spark.operators.validation import (
    column_profile,
)


def test_benford_gate_separates_fabricated_from_benford(spark):
    """VERDICT r8 #4's acceptance test: a uniform digit spray (the
    classic fabrication signature) trips the gate while a
    Benford-distributed source passes, at the same n."""
    rng = random.Random(99)
    # Benford-ish: magnitudes 10^u for uniform u span digits with the
    # log density the gate expects
    benford = [
        ("real", 10 ** rng.uniform(0, 3)) for _ in range(4000)
    ]
    # fabricated: uniform on [1, 10) => uniform first digits
    fake = [("fake", rng.uniform(1.0, 10.0)) for _ in range(4000)]
    df = spark.createDataFrame(benford + fake, "src string, v double")
    out = {
        r["src"]: r
        for r in benford_source_gate(df, "src", "v").collect()
    }
    assert out["real"]["n_total"] == 4000
    assert not out["real"]["is_suspect"], (
        "Benford-distributed source tripped the gate: score "
        f"{out['real']['score_micro']}"
    )
    assert out["fake"]["is_suspect"], (
        "uniform-digit source passed the gate: score "
        f"{out['fake']['score_micro']}"
    )
    # effect-size separation is wide, not marginal (docstring's claim:
    # uniform ≈ 3.7e5 micro, Benford near 0, fence 3e4)
    assert out["fake"]["score_micro"] > 10 * out["real"]["score_micro"]


def test_benford_gate_exact_python_reference(spark):
    """Gate arithmetic replayed in pure Python over a small fixed
    sample — pins the integer DIV convention end to end."""
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        BENFORD_MICRO,
    )

    rows = [("g", float(v)) for v in [1.2, 1.2, 2.5, 3.01, 9.99, 19.0]]
    df = spark.createDataFrame(rows, "src string, v double")
    got = benford_source_gate(df, "src", "v").collect()[0]

    digits = [1, 1, 2, 3, 9, 1]
    n = len(digits)
    obs = {d: digits.count(d) for d in range(1, 10)}
    pdev = {
        d: (obs[d] * 1_000_000) // n - p for d, p in BENFORD_MICRO
    }
    score = sum(pdev[d] ** 2 // p for d, p in BENFORD_MICRO)
    assert got["n_total"] == n
    assert got["max_abs_pdev_micro"] == max(abs(v) for v in pdev.values())
    assert got["score_micro"] == score
    assert got["is_suspect"] == (score > 30_000)


def test_column_profile_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "a", 1.5),
            (3, None, 1.5),
            (4, "b", 2.5),
            (4, "b", None),
        ],
        "id long, s string, x double",
    )
    got = {
        r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in column_profile(df, ["id", "s", "x"]).collect()
    }
    assert got == {
        "id": (5, 0, 4),
        "s": (5, 1, 2),
        "x": (5, 2, 2),
    }


def test_column_profile_rejects_empty():
    with pytest.raises(ValueError):
        column_profile(None, [])


def _brute_skyline(rows):
    """Quadratic dominance reference."""
    out = []
    for g, i, x, y in rows:
        dominated = any(
            g2 == g
            and x2 <= x
            and y2 <= y
            and (x2 < x or y2 < y)
            for g2, _, x2, y2 in rows
        )
        if not dominated:
            out.append((g, i, x, y))
    return sorted(out)


def test_skyline_matches_bruteforce_fuzz(spark):
    rng = random.Random(7)
    rows = [
        (
            f"g{rng.randrange(3)}",
            i,
            float(rng.randrange(0, 40)) / 2.0,
            rng.randrange(0, 30),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, x double, y int")
    got = sorted(
        (r["grp"], r["id"], r["x"], r["y"])
        for r in skyline_2d(
            df, by="grp", x_col="x", y_col="y", id_cols=["id"]
        ).collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_ties_and_nulls(spark):
    rows = [
        # coincident optima: both survive (neither strictly dominates)
        ("g", 1, 1.0, 5),
        ("g", 2, 1.0, 5),
        # dominated on y at equal x
        ("g", 3, 1.0, 6),
        # cheaper x, larger y: survives (incomparable with id 1/2)
        ("g", 4, 0.5, 9),
        # dominated by id 4
        ("g", 5, 0.5, 10),
        # null criterion: excluded
        ("g", 6, None, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, x double, y int")
    got = sorted(
        r["id"]
        for r in skyline_2d(
            df, by="grp", x_col="x", y_col="y", id_cols=["id"]
        ).collect()
    )
    assert got == [1, 2, 4]


def test_mad_fences_match_full_readout(spark):
    """ADVICE r8 refactor guard: the fences-only helper returns
    exactly median ∓ k×MAD from the full readout."""
    rng = random.Random(13)
    rows = [
        (f"g{rng.randrange(3)}", rng.uniform(0, 50)) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    cells = value_cells(df, "grp", "v")
    full = {
        r["_by"]: (r["median_centi"], r["mad_centi"])
        for r in mad_from_counts(cells, k=3).collect()
    }
    fences = {
        r["_by"]: (r["_lo"], r["_hi"])
        for r in mad_fences_from_counts(cells, k=3).collect()
    }
    assert set(full) == set(fences)
    for g, (med, mad) in full.items():
        assert fences[g] == (med - 3 * mad, med + 3 * mad)


def test_check_constraints(spark):
    from music_streaming_data_pipeline_v2_spark.operators.validation import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, "a", 1.5),
            (3, None, 2.5),
            (4, "b", 3.5),
        ],
        "id long, s string, x double",
    )
    rules = [
        ("id", "unique", None),        # 4 distinct, 0 nulls -> pass
        ("s", "unique", None),         # nulls + dups -> fail
        ("s", "complete", None),       # 1 null -> fail
        ("x", "null_rate_le", 250_000),  # 1/4 = 250000 micro -> pass
        ("x", "null_rate_le", 249_999),  # -> fail
        ("s", "distinct_ge", 2),       # 2 distinct -> pass
        ("s", "distinct_le", 1),       # -> fail
    ]
    got = {
        (r["column_name"], r["kind"], r["threshold"]): (
            r["observed"],
            r["passed"],
        )
        for r in check_constraints(df, rules).collect()
    }
    assert got[("id", "unique", None)] == (4, True)
    assert got[("s", "unique", None)] == (2, False)
    assert got[("s", "complete", None)] == (1, False)
    assert got[("x", "null_rate_le", 250_000)] == (250_000, True)
    assert got[("x", "null_rate_le", 249_999)] == (250_000, False)
    assert got[("s", "distinct_ge", 2)] == (2, True)
    assert got[("s", "distinct_le", 1)] == (2, False)


def test_check_constraints_validation(spark):
    from music_streaming_data_pipeline_v2_spark.operators.validation import (
        check_constraints,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="at least one"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="unknown constraint"):
        check_constraints(df, [("id", "bogus", None)])
    with pytest.raises(ValueError, match="needs a threshold"):
        check_constraints(df, [("id", "distinct_ge", None)])
