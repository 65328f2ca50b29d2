"""As-of join edge cases: no-predecessor nulls, equal-ts inclusivity,
per-key isolation, duplicate-ts tie-breaking."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from music_streaming_data_pipeline_v2_spark.operators.asof import as_of_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, key="a", ts=_ts("2024-01-01 09:00:00")),  # before any right
            Row(lid=2, key="a", ts=_ts("2024-01-01 10:00:00")),  # == right ts (inclusive)
            Row(lid=3, key="a", ts=_ts("2024-01-01 11:30:00")),  # between rights
            Row(lid=4, key="a", ts=_ts("2024-01-01 13:00:00")),  # after last right
            Row(lid=5, key="b", ts=_ts("2024-01-01 12:00:00")),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(key="a", ts=_ts("2024-01-01 10:00:00"), v=10),
            Row(key="a", ts=_ts("2024-01-01 12:00:00"), v=12),
            Row(key="b", ts=_ts("2024-01-01 11:00:00"), v=99),
        ]
    )
    out = {
        r.lid: r.v
        for r in as_of_join(
            left, right, on="key", left_ts="ts", right_ts="ts", payload_cols=["v"]
        ).collect()
    }
    assert out == {1: None, 2: 10, 3: 10, 4: 12, 5: 99}


def test_as_of_join_duplicate_right_ts_tiebreak(spark):
    left = spark.createDataFrame([Row(lid=1, key="a", ts=_ts("2024-01-01 10:30:00"))])
    right = spark.createDataFrame(
        [
            Row(key="a", ts=_ts("2024-01-01 10:00:00"), v=1),
            Row(key="a", ts=_ts("2024-01-01 10:00:00"), v=2),
        ]
    )
    out = as_of_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        payload_cols=["v"], tie_col="v",
    ).collect()
    assert out[0].v == 2  # last by tie_col wins, deterministically


def test_band_join_no_nested_loop(spark):
    """Band join is a hash equi-join on chunks, never a nested loop;
    pairs appear exactly once (adjacent-chunk explode can't dup)."""
    from music_streaming_data_pipeline_v2_spark.operators.rangejoin import band_join

    left = spark.createDataFrame(
        [Row(lid=i, ts=_ts(f"2024-01-01 10:{i:02d}:00")) for i in range(10)]
    )
    right = spark.createDataFrame(
        [Row(rid=j, rts=_ts(f"2024-01-01 10:{j:02d}:30")) for j in range(10)]
    )
    out = band_join(left, right, "ts", "rts", band_seconds=120)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    rows = [(r.lid, r.rid) for r in out.collect()]
    assert len(rows) == len(set(rows))  # no duplicate pairs
    # ground truth: |60*(lid - rid) - 30| <= 120 seconds
    truth = {
        (i, j) for i in range(10) for j in range(10)
        if abs((i * 60) - (j * 60 + 30)) <= 120
    }
    assert set(rows) == truth


def test_funnel_native_matches_pandas_kernel(spark):
    from music_streaming_data_pipeline_v2_spark.operators.funnel import (
        transition_counts,
        transition_counts_native,
    )

    rows = []
    seq = ["click", "purchase", "view", "click", "click", "purchase", "view"]
    for u in range(5):
        for i, s in enumerate(seq):
            rows.append(
                Row(user_id=u, ts=_ts(f"2024-01-01 10:{(u * 10 + i) % 60:02d}:00"),
                    event_type=s)
            )
    df = spark.createDataFrame(rows)
    a = {r.user_id: r.n_transitions for r in transition_counts(df).collect()}
    b = {r.user_id: r.n_transitions for r in transition_counts_native(df).collect()}
    assert a == b
    assert all(v == 2 for v in a.values())  # two click->purchase per user


def test_ewma_string_entity_and_recurrence(spark):
    """EWMA kernel: exact recurrence values, and the output id column
    inherits the input type (string entities work, not just longs)."""
    from music_streaming_data_pipeline_v2_spark.operators.funnel import ewma_by_entity

    df = spark.createDataFrame(
        [("u1", 1, 1, 8.0), ("u1", 2, 2, 4.0), ("u1", 3, 3, 2.0), ("u2", 1, 4, 1.0)],
        "user_id string, ts long, event_id long, value double",
    )
    out = ewma_by_entity(df, alpha=0.5)
    assert dict(out.dtypes)["user_id"] == "string"
    got = {(r["user_id"], r["event_id"]): r["ewma"] for r in out.collect()}
    assert got == {("u1", 1): 8.0, ("u1", 2): 6.0, ("u1", 3): 4.0, ("u2", 4): 1.0}


def test_as_of_join_null_timestamps_and_collisions(spark):
    """Null-ts right rows must never match (asc sort is NULLS FIRST —
    unfiltered they'd become the as-of state for every early left
    row); null-ts left rows keep a null payload; colliding payload
    names are refused loudly."""
    from pyspark.sql import Row

    from music_streaming_data_pipeline_v2_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [
            Row(k="a", ts=5, ev="early"),     # before every real right row
            Row(k="a", ts=15, ev="mid"),
            Row(k="a", ts=None, ev="null-ts"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=None, setting="poison"),  # must never match
            Row(k="a", rts=10, setting="s10"),
        ]
    )
    out = {
        r.ev: r.setting
        for r in as_of_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload_cols=["setting"],
        ).collect()
    }
    assert out == {"early": None, "mid": "s10", "null-ts": None}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        as_of_join(
            left, right.withColumnRenamed("setting", "ev"),
            on="k", left_ts="ts", right_ts="rts", payload_cols=["ev"],
        )
