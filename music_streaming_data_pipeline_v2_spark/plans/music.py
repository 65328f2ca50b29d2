"""The reference's transform job as one composed DataFrame plan.

Mirrors glue_jobs/music-streaming-transform.py:187-210 (load → enrich →
three KPI pipelines → save) with the anti-patterns removed:

- ``enriched.cache()`` — the three KPI outputs share one enrichment
  subplan; the reference recomputes it per output and additionally burns
  seven diagnostic ``count()`` actions (music-streaming-transform.py:43-51,
  87, 108, 132, 156). Here the shared input is cached once (or, when
  writing, all three sinks run off the cached plan in one pass).
- no ``coalesce(1)`` writes — outputs keep natural partitioning or are
  partitioned by date (io/sinks.py).
- deterministic top-K ordering — ``row_number`` tie-broken by item key
  (operators/topk.py), where the reference's ties are arbitrary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.aggregates import daily_genre_kpis, plays_per_item
from ..io.sinks import write_partitioned
from ..operators.enrich import enrich_streams
from ..operators.reshape import build_kv_table
from ..operators.topk import top_k_per_group


@dataclass
class MusicKpiOutputs:
    enriched: DataFrame
    genre_kpis: DataFrame
    top_songs: DataFrame
    top_genres: DataFrame
    kv: DataFrame


def run_music_pipeline(
    streams: DataFrame,
    songs: DataFrame,
    users: DataFrame,
    process_date: str | None = None,
    cache_enriched: bool = True,
    approx_distinct: bool = False,
) -> MusicKpiOutputs:
    """Build the full KPI plan; nothing is executed until an action."""
    enriched = enrich_streams(streams, songs, users, process_date=process_date)
    if cache_enriched:
        enriched = enriched.cache()

    genre_kpis = daily_genre_kpis(enriched, approx_distinct=approx_distinct)

    song_counts = plays_per_item(
        enriched, ["track_genre", "date", "track_id", "track_name", "artists"]
    )
    top_songs = top_k_per_group(
        song_counts,
        partition_cols=["track_genre", "date"],
        order_col="play_count",
        k=3,
        tie_break_cols=["track_id"],
    ).select(
        "track_genre", "date", "rank", "track_id", "track_name", "artists", "play_count"
    )

    # A4 is the same grain as A1's listen_count — reuse instead of
    # recomputing (music-streaming-transform.py:145-147 recomputes).
    genre_totals = genre_kpis.select(
        "track_genre", "date", genre_kpis.listen_count.alias("total_plays")
    )
    top_genres = top_k_per_group(
        genre_totals,
        partition_cols=["date"],
        order_col="total_plays",
        k=5,
        tie_break_cols=["track_genre"],
    ).select("date", "rank", "track_genre", "total_plays")

    kv = build_kv_table(genre_kpis, top_songs, top_genres)
    return MusicKpiOutputs(enriched, genre_kpis, top_songs, top_genres, kv)


def write_music_outputs(
    outputs: MusicKpiOutputs, base_dir: str, partition_by_date: bool = True
) -> None:
    """Materialize all four result tables in one pass.

    The enrichment subplan is shared (cached by run_music_pipeline), so
    the three KPI sinks and the kv sink reuse one scan+join instead of
    recomputing per sink (the reference recomputes everything per
    output, music-streaming-transform.py:162-185). Outputs partition by
    date — daily recompute is a dynamic partition overwrite — and the
    kv table additionally sorts by (pk, sk) within files so serving
    predicates skip row groups.
    """
    import os

    part = ["date"] if partition_by_date else None
    write_partitioned(outputs.genre_kpis, os.path.join(base_dir, "genre_kpis"), part)
    write_partitioned(outputs.top_songs, os.path.join(base_dir, "top_songs"), part)
    write_partitioned(outputs.top_genres, os.path.join(base_dir, "top_genres"), part)
    kv = outputs.kv.sortWithinPartitions("pk", "sk")
    writer = kv.write.mode("overwrite")
    if partition_by_date:
        writer = writer.partitionBy("date")
    writer.parquet(os.path.join(base_dir, "kv"))
