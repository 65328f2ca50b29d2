"""Coerce-and-drop validation semantics (reference validate.py:46-128).

Each test feeds deliberately dirty rows and asserts the exact reference
behavior: which rows drop, which coerce, which default to 0.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from music_streaming_data_pipeline_v2_spark.operators.validation import (
    EmptyResultError,
    SchemaError,
    validate_columns,
    validate_songs,
    validate_streams,
    validate_users,
)


def test_validate_columns_raises_on_missing(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(SchemaError):
        validate_columns(df, ["a", "b"], "x")
    validate_columns(df, ["a"], "x")  # no raise


def _users_df(spark, rows):
    cols = ["user_id", "user_name", "user_age", "user_country", "created_at"]
    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


def test_validate_users_drops_and_coerces(spark):
    rows = [
        ("1", "alice", "30", "US", "2024-01-01 00:00:00"),   # keep
        (None, "bob", "25", "US", "2024-01-01 00:00:00"),    # null id → drop
        ("3", None, "25", "US", "2024-01-01 00:00:00"),      # null name → drop
        ("4", "carol", "12", "US", "2024-01-01 00:00:00"),   # age < 13 → drop
        ("5", "dan", "121", "US", "2024-01-01 00:00:00"),    # age > 120 → drop
        ("6", "eve", "abc", "US", "2024-01-01 00:00:00"),    # non-numeric age → drop
        ("7", "fred", "40", None, "2024-01-01 00:00:00"),    # null country → KEPT
        ("8", "gina", "41", "US", "not a date"),             # bad created_at → drop
        ("9", "hank", "42.5", "US", "2024-01-01 00:00:00"),  # float age kept (pandas to_numeric)
    ]
    out = validate_users(_users_df(spark, rows)).orderBy("user_id").collect()
    assert [r.user_id for r in out] == ["1", "7", "9"]
    assert out[2].user_age == 42  # int cast truncation
    assert out[0].created_at == dt.datetime(2024, 1, 1)
    types = dict(validate_users(_users_df(spark, rows)).dtypes)
    assert types == {
        "user_id": "string",
        "user_name": "string",
        "user_age": "int",
        "user_country": "string",
        "created_at": "timestamp",
    }


def _songs_row(**over):
    base = dict(
        id="1", track_id="t1", track_name="n", album_name="a", artists="x",
        popularity="50", duration_ms="200000", explicit="0", danceability="0.5",
        energy="0.6", loudness="-5.0", speechiness="0.1", acousticness="0.2",
        instrumentalness="0.0", liveness="0.3", valence="0.4", tempo="120.0",
        key="5", mode="1", time_signature="4", track_genre="  Rock ",
    )
    base.update(over)
    return Row(**base)


def test_validate_songs_semantics(spark):
    df = spark.createDataFrame(
        [
            _songs_row(),
            _songs_row(track_id=None),                       # drop: null key
            _songs_row(popularity="NaNtext"),                # drop: non-numeric popularity
            _songs_row(duration_ms=None),                    # drop: null duration
            _songs_row(track_id="t2", key=None, mode=None,
                       time_signature=None),                 # kept: fill 0
        ]
    )
    out = validate_songs(df).orderBy("track_id").collect()
    assert [r.track_id for r in out] == ["t1", "t2"]
    assert out[0].track_genre == "rock"  # lower + trim (validate.py:96)
    assert (out[1].key, out[1].mode, out[1].time_signature) == (0, 0, 0)
    types = dict(validate_songs(df).dtypes)
    assert types["explicit"] == "tinyint"
    assert types["danceability"] == "float"
    assert types["popularity"] == "int"


def test_validate_streams_semantics(spark):
    cols = ["user_id", "track_id", "listen_time"]
    rows = [
        ("1", "t1", "2024-06-25 10:00:00"),  # keep
        (None, "t1", "2024-06-25 10:00:00"),  # drop
        ("2", "t2", "garbage"),               # unparseable ts → drop
    ]
    df = spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])
    out = validate_streams(df).collect()
    assert len(out) == 1 and out[0].user_id == "1"


def test_validate_streams_empty_raises(spark):
    cols = ["user_id", "track_id", "listen_time"]
    df = spark.createDataFrame([Row(**dict(zip(cols, ("1", "t1", "bad"))))])
    with pytest.raises(EmptyResultError):
        validate_streams(df)
