"""Property-based parity: the Spark validation operators agree with the
reference's pandas coerce-and-drop semantics (validate.py:46-128) on
randomized dirty inputs.

The oracle below is an independent re-statement of those semantics in
pandas (dropna / to_numeric(errors='coerce') / between / to_datetime),
NOT engine code — hypothesis drives both through the same dirty rows
and the surviving (user_id, user_age) sets must match exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from music_streaming_data_pipeline_v2_spark.operators.validation import (
    validate_streams,
    validate_users,
)

# dirty cell generators
_age = st.one_of(
    st.none(),
    st.integers(-5, 150).map(str),
    st.sampled_from(["abc", "", " ", "12.7", "1e2", "NaN"]),
)
_ts = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "2024-01-01 00:00:00",
            "2024-06-25 13:37:00",
            "not-a-date",
            "2024-13-45",
            "",
        ]
    ),
)
_name = st.one_of(st.none(), st.sampled_from(["alice", "bob", ""]))

_user_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 99).map(str)),  # user_id
    _name,
    _age,
    st.one_of(st.none(), st.sampled_from(["US", "DE"])),
    _ts,
)


def _pandas_users_oracle(rows: list[tuple]) -> set[tuple]:
    """Reference semantics restated in pandas (validate.py:46-63)."""
    # NB: the reference keeps empty user_name strings (dropna only
    # removes nulls) — mirrored exactly here.
    df = pd.DataFrame(
        rows, columns=["user_id", "user_name", "user_age", "user_country", "created_at"]
    ).dropna(subset=["user_id", "user_name", "user_age", "created_at"])
    age_num = pd.to_numeric(df["user_age"], errors="coerce")
    df = df[age_num.between(13, 120)]
    created = pd.to_datetime(df["created_at"], errors="coerce")
    df = df[created.notna()]
    age_final = pd.to_numeric(df["user_age"], errors="coerce").astype("int64")
    return set(zip(df["user_id"].astype(str), age_final))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(_user_row, min_size=1, max_size=25))
def test_validate_users_matches_pandas_semantics(spark, rows):
    sdf = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["user_id", "user_name", "user_age", "user_country", "created_at"],
        ).astype(object).where(pd.notna, None)
    )
    got = {
        (r.user_id, r.user_age) for r in validate_users(sdf).collect()
    }
    want = _pandas_users_oracle(rows)
    assert got == want


_stream_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 9).map(str)),
    st.one_of(st.none(), st.sampled_from(["t1", "t2"])),
    _ts,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=st.lists(_stream_row, min_size=1, max_size=25))
def test_validate_streams_matches_pandas_semantics(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "track_id", "listen_time"])
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna, None))
    got = {
        (r.user_id, r.track_id, r.listen_time.isoformat())
        for r in validate_streams(sdf, check_nonempty=False).collect()
    }
    base = pdf.dropna(subset=["user_id", "track_id", "listen_time"])
    ts = pd.to_datetime(base["listen_time"], errors="coerce")
    keep = base[ts.notna()]
    want = {
        (u, t, pd.to_datetime(lt).isoformat())
        for u, t, lt in zip(keep["user_id"], keep["track_id"], keep["listen_time"])
    }
    assert got == want
