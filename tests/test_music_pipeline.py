"""End-to-end music pipeline semantics (reference transform job +
DynamoDB reshape), on a small synthetic music-schema dataset.

Property checks mirror SURVEY.md §5: inner-join containment, rank
uniqueness and K-bounds, unpivot row-count = 4× genre_kpis, KV key
formats, idempotent date recompute.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.serving import (
    query_pk_prefix,
    query_pk_sk,
    query_pk_sk_between,
)
from music_streaming_data_pipeline_v2_spark.plans.music import run_music_pipeline


@pytest.fixture(scope="module")
def music(spark):
    songs = spark.createDataFrame(
        [
            Row(track_id=f"t{i}", track_name=f"name{i}", album_name="al",
                artists=f"artist{i}", duration_ms=100000 + i * 1000,
                track_genre="rock" if i % 2 == 0 else "jazz")
            for i in range(10)
        ]
    )
    users = spark.createDataFrame(
        [
            Row(user_id=str(u), user_name=f"u{u}", user_age=20 + u,
                user_country="US")
            for u in range(5)
        ]
    )
    streams = spark.createDataFrame(
        [
            Row(user_id=str(i % 5), track_id=f"t{i % 10}",
                listen_time=f"2024-06-{25 + (i % 2):02d} 10:{i % 60:02d}:00")
            for i in range(200)
        ]
        + [  # events referencing unknown dims → must be inner-join dropped
            Row(user_id="99", track_id="t0", listen_time="2024-06-25 10:00:00"),
            Row(user_id="0", track_id="zz", listen_time="2024-06-25 10:00:00"),
        ]
    ).withColumn("listen_time", F.to_timestamp("listen_time"))
    return run_music_pipeline(streams, songs, users)


def test_inner_join_drops_unknown(music):
    # 200 valid stream rows; the 2 unknown-key rows vanish (J1/J2 inner)
    assert music.enriched.count() == 200


def test_genre_kpis_shape_and_values(music):
    rows = {(r.track_genre, str(r.date)): r for r in music.genre_kpis.collect()}
    assert set(k[0] for k in rows) == {"rock", "jazz"}
    # even i → even track (rock) and day 25: all 100 rock plays on 06-25
    r = rows[("rock", "2024-06-25")]
    assert r.listen_count == 100
    assert r.unique_listeners == 5
    assert r.avg_listening_time_per_user == r.total_listening_time_ms / r.unique_listeners


def test_top_songs_bounds_and_rank_uniqueness(music):
    pdf = music.top_songs.toPandas()
    g = pdf.groupby(["track_genre", "date"])
    assert (g.size() <= 3).all()
    for _, grp in g:
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_top_genres_bounds(music):
    pdf = music.top_genres.toPandas()
    assert (pdf.groupby("date").size() <= 5).all()
    assert set(pdf["rank"]) <= {1, 2, 3, 4, 5}


def test_kv_unpivot_multiplicity_and_key_format(music):
    kv = music.kv.toPandas()
    n_kpis = music.genre_kpis.count()
    metric_rows = kv[kv.sk.str.startswith("METRIC#")]
    assert len(metric_rows) == 4 * n_kpis  # dynamodb-ingestion.py:57-62
    assert metric_rows.pk.str.match(r"^GENRE#[a-z]+#DATE#\d{4}-\d{2}-\d{2}$").all()
    song_rows = kv[kv.sk.str.startswith("SONG#")]
    assert song_rows.sk.str.match(r"^SONG#\d+#t\d+$").all()
    rank_rows = kv[kv.sk.str.startswith("GENRE_RANK#")]
    assert rank_rows.pk.str.match(r"^DATE#\d{4}-\d{2}-\d{2}$").all()


def test_serving_queries(music):
    kv = music.kv
    pk = "GENRE#rock#DATE#2024-06-25"
    metrics = query_pk_prefix(kv, pk, "METRIC#").collect()
    assert len(metrics) == 4
    one = query_pk_sk(kv, pk, "METRIC#listen_count").collect()
    assert len(one) == 1 and one[0].value == "100"
    top2 = query_pk_sk_between(kv, pk, "SONG#1#", "SONG#2#z").collect()
    assert {re.match(r"SONG#(\d)#", r.sk).group(1) for r in top2} == {"1", "2"}
    # only rock played on 06-25 (jazz plays all fall on 06-26)
    ranks = query_pk_sk_between(
        kv, "DATE#2024-06-25", "GENRE_RANK#1", "GENRE_RANK#2"
    ).collect()
    assert [r.genre for r in ranks] == ["rock"]


def test_process_date_filter(spark, music):
    # P6: recompute-one-day filter keeps only that date
    from music_streaming_data_pipeline_v2_spark.operators.enrich import enrich_streams

    streams = music.enriched.select("user_id", "track_id", "listen_time")
    songs = music.enriched.select(
        "track_id", "track_name", "track_genre", "artists", "duration_ms"
    ).dropDuplicates(["track_id"])
    users = music.enriched.select("user_id", "user_age", "user_country").dropDuplicates(
        ["user_id"]
    )
    one_day = enrich_streams(streams, songs, users, process_date="2024-06-25")
    assert one_day.select("date").distinct().collect()[0].date.isoformat() == "2024-06-25"


def test_kv_serving_pushdown_on_parquet(spark, music, tmp_path):
    """SCALE.md claim: serving predicates reach the Parquet scan as
    PushedFilters (EqualTo pk + StringStartsWith sk) when the kv
    relation is persisted as a table."""
    path = str(tmp_path / "kv")
    music.kv.write.mode("overwrite").parquet(path)
    kv = spark.read.parquet(path)
    q = query_pk_prefix(kv, "GENRE#rock#DATE#2024-06-25", "METRIC#")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(pk,GENRE#rock#DATE#2024-06-25)" in plan
    assert "StringStartsWith(sk,METRIC#)" in plan
    assert q.count() == 4


def test_write_music_outputs_one_pass(spark, music, tmp_path):
    from music_streaming_data_pipeline_v2_spark.plans.music import write_music_outputs

    base = str(tmp_path / "outs")
    write_music_outputs(music, base)
    kpis = spark.read.parquet(f"{base}/genre_kpis")
    kv = spark.read.parquet(f"{base}/kv")
    assert kpis.count() == music.genre_kpis.count()
    assert kv.count() == music.kv.count()
    # date-partitioned layout on disk
    import os

    assert any(d.startswith("date=") for d in os.listdir(f"{base}/genre_kpis"))
    assert any(d.startswith("date=") for d in os.listdir(f"{base}/kv"))
