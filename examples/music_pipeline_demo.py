"""End-to-end demo: everything the reference pipeline does, in one
Spark application.

Reference flow (README.md:36-41): S3 upload → Lambda → Airflow DAG →
pandas validation → Glue Spark transform → Glue shell DynamoDB load →
archival. Here the same flow is this single script:

1. generate raw CSVs (dirty rows included) into a drop directory
2. incremental streaming ingest: validate (coerce-and-drop),
   quarantine bad rows, recompute affected days, archive inputs —
   exactly-once per file
3. batch KPI pipeline: enrichment joins → daily genre KPIs →
   top-3 songs / top-5 genres → KV projection
4. serve the nine DynamoDB query patterns straight off the kv relation

Run:  python examples/music_pipeline_demo.py  [workdir]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.serving import (
    query_pk_prefix,
    query_pk_sk,
    query_pk_sk_between,
)
from music_streaming_data_pipeline_v2_spark.operators.validation import (
    validate_songs,
    validate_users,
)
from music_streaming_data_pipeline_v2_spark.plans.music import run_music_pipeline
from music_streaming_data_pipeline_v2_spark.session import get_spark
from music_streaming_data_pipeline_v2_spark.streaming import run_incremental_pipeline

GENRES = ["rock", "jazz", "pop", "hip-hop", "classical"]


def generate_raw(workdir: str, n_songs=50, n_users=30, n_files=3, rows_per_file=200):
    rng = random.Random(7)
    os.makedirs(f"{workdir}/drop", exist_ok=True)
    with open(f"{workdir}/songs.csv", "w") as f:
        f.write("id,track_id,track_name,album_name,artists,popularity,duration_ms,"
                "explicit,danceability,energy,loudness,speechiness,acousticness,"
                "instrumentalness,liveness,valence,tempo,key,mode,time_signature,track_genre\n")
        for i in range(n_songs):
            genre = GENRES[i % len(GENRES)]
            f.write(f"{i},T{i:04d},Song {i},Album {i // 5},Artist {i % 7},"
                    f"{rng.randint(0, 100)},{rng.randint(120000, 300000)},0,"
                    f"0.5,0.6,-7.0,0.1,0.2,0.0,0.3,0.4,120.0,5,1,4,  {genre.upper()} \n")
    with open(f"{workdir}/users.csv", "w") as f:
        f.write("user_id,user_name,user_age,user_country,created_at\n")
        for u in range(n_users):
            age = rng.randint(15, 70) if u % 10 else 999  # dirty ages dropped
            f.write(f"{u},User {u},{age},US,2023-01-0{u % 9 + 1}\n")
    for n in range(n_files):
        with open(f"{workdir}/drop/stream{n}.csv", "w") as f:
            f.write("user_id,track_id,listen_time\n")
            for _ in range(rows_per_file):
                u, t = rng.randrange(n_users), rng.randrange(n_songs)
                day, hh, mm = 20 + n, rng.randrange(24), rng.randrange(60)
                f.write(f"{u},T{t:04d},2024-06-{day} {hh:02d}:{mm:02d}:00\n")
            f.write("9999,T0000,not-a-timestamp\n")  # quarantined


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/music_demo"
    spark = get_spark("music-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    generate_raw(workdir)

    # --- validate static dims once (reference validate_metadata_once) ---
    songs = validate_songs(
        spark.read.option("header", True).csv(f"{workdir}/songs.csv")
    )
    users = validate_users(
        spark.read.option("header", True).csv(f"{workdir}/users.csv")
    )
    print(f"dims validated: {songs.count()} songs, {users.count()} users "
          f"(dirty ages dropped)")

    # --- incremental streaming ingest (exactly-once + archive) ---
    run_incremental_pipeline(
        spark, f"{workdir}/drop", songs, users,
        output_dir=f"{workdir}/out", checkpoint_dir=f"{workdir}/ckpt",
        archive_dir=f"{workdir}/archive", quarantine_dir=f"{workdir}/quarantine",
    )
    validated = spark.read.parquet(f"{workdir}/out/validated")
    print(f"ingested {validated.count()} listens; "
          f"quarantined {spark.read.parquet(f'{workdir}/quarantine').count()}")

    # --- batch KPI pipeline + KV projection ---
    out = run_music_pipeline(
        validated.select("user_id", "track_id", "listen_time"), songs, users
    )
    print("genre_kpis sample:")
    out.genre_kpis.orderBy("date", "track_genre").show(5)
    print("top_songs sample:")
    out.top_songs.orderBy("date", "track_genre", "rank").show(5)

    # --- the 9 serving patterns (queries/dynamo_query.txt) ---
    kv = out.kv
    some = out.genre_kpis.select("track_genre", "date").first()
    pk = f"GENRE#{some.track_genre}#DATE#{some.date}"
    print(f"serving: all metrics for {pk}")
    query_pk_prefix(kv, pk, "METRIC#").show(truncate=False)
    print("serving: exact metric")
    query_pk_sk(kv, pk, "METRIC#listen_count").show(truncate=False)
    print("serving: top-2 songs range")
    query_pk_sk_between(kv, pk, "SONG#1#", "SONG#2#z").show(truncate=False)
    print(f"serving: genre ranks for DATE#{some.date}")
    query_pk_prefix(kv, f"DATE#{some.date}", "GENRE_RANK#").show(truncate=False)


if __name__ == "__main__":
    main()
