"""Explicit schema contracts (StructType per table).

The reference enforces schemas by hand: a hardcoded required-column check
(reference dags/tasks/validate.py:36-44) plus pandas type coercion
(validate.py:46-128). Here every table has a declared StructType — no
inference in the engine — and validation (operators/validation.py) coerces
into these types with the same drop/default semantics.

Two schema groups:

1. Reference-native music tables (streams / songs / users) — exact types
   from validate.py:51-117 and the committed run artifacts
   (reference output/*.parquet).
2. The driver test tables under /root/testdata/ (TESTDATA.md): a TPC-H-ish
   star schema plus events / documents / embeddings for the extension
   operators.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Reference-native music star schema
# ---------------------------------------------------------------------------

#: Fact table: one row per listen event (validate.py:109-117).
STREAMS = T.StructType(
    [
        T.StructField("user_id", T.StringType(), nullable=False),
        T.StructField("track_id", T.StringType(), nullable=False),
        T.StructField("listen_time", T.TimestampType(), nullable=False),
    ]
)

#: Users dimension (validate.py:51-60; artifact: 5 cols, 50k rows).
USERS = T.StructType(
    [
        T.StructField("user_id", T.StringType(), nullable=False),
        T.StructField("user_name", T.StringType(), nullable=False),
        T.StructField("user_age", T.IntegerType(), nullable=False),
        T.StructField("user_country", T.StringType(), nullable=True),
        T.StructField("created_at", T.TimestampType(), nullable=False),
    ]
)

#: Songs dimension — Spotify-tracks shape (validate.py:70-99).
SONGS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=True),
        T.StructField("track_id", T.StringType(), nullable=False),
        T.StructField("track_name", T.StringType(), nullable=False),
        T.StructField("album_name", T.StringType(), nullable=True),
        T.StructField("artists", T.StringType(), nullable=False),
        T.StructField("popularity", T.IntegerType(), nullable=False),
        T.StructField("duration_ms", T.IntegerType(), nullable=False),
        T.StructField("explicit", T.ByteType(), nullable=True),
        T.StructField("danceability", T.FloatType(), nullable=True),
        T.StructField("energy", T.FloatType(), nullable=True),
        T.StructField("loudness", T.FloatType(), nullable=True),
        T.StructField("speechiness", T.FloatType(), nullable=True),
        T.StructField("acousticness", T.FloatType(), nullable=True),
        T.StructField("instrumentalness", T.FloatType(), nullable=True),
        T.StructField("liveness", T.FloatType(), nullable=True),
        T.StructField("valence", T.FloatType(), nullable=True),
        T.StructField("tempo", T.FloatType(), nullable=True),
        T.StructField("key", T.IntegerType(), nullable=False),
        T.StructField("mode", T.IntegerType(), nullable=False),
        T.StructField("time_signature", T.IntegerType(), nullable=False),
        T.StructField("track_genre", T.StringType(), nullable=False),
    ]
)

#: Required-column contracts (validate.py:146-148, 155-157, 212).
REQUIRED_COLUMNS = {
    "streams": ["user_id", "track_id", "listen_time"],
    "users": ["user_id", "user_name", "user_age", "user_country", "created_at"],
    "songs": [
        "track_id",
        "track_name",
        "artists",
        "popularity",
        "duration_ms",
        "track_genre",
    ],
}

#: Derived KPI output schemas (music-streaming-transform.py:100-153).
GENRE_KPIS = T.StructType(
    [
        T.StructField("track_genre", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("listen_count", T.LongType()),
        T.StructField("unique_listeners", T.LongType()),
        T.StructField("total_listening_time_ms", T.LongType()),
        T.StructField("avg_listening_time_ms", T.DoubleType()),
        T.StructField("avg_listening_time_per_user", T.DoubleType()),
    ]
)

#: KV projection record (dynamodb-ingestion.py:46-131).
KV_RECORD = T.StructType(
    [
        T.StructField("pk", T.StringType(), nullable=False),
        T.StructField("sk", T.StringType(), nullable=False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

# ---------------------------------------------------------------------------
# 2. Driver test tables (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: All tables present in a testdata scale-factor directory.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
