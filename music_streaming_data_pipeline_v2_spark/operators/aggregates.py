"""Grouped aggregations (reference A1-A5).

Reference: daily genre KPIs — count(*), countDistinct(user), sum(ms),
avg(ms), plus a derived ratio (glue_jobs/music-streaming-transform.py:
100-106); play counts at two grains (121-123, 145-147).

Spark-first decisions:

- All built-in aggregate functions → partial (map-side) aggregation and
  whole-stage codegen for free; one shuffle on the group key.
- ``countDistinct`` is exact (two-phase expand) to match the reference;
  ``approx_distinct=True`` swaps in HLL++ (``approx_count_distinct``)
  for the 100 TB path where the expand's extra shuffle volume dominates.
- The generic functions are column-parameterized so the same operator
  serves the music schema and the driver test tables.
- The reference recomputes the genre-day count twice (A1 listen_count and
  A4 total_plays); callers here reuse one ``daily_genre_kpis`` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_genre_kpis(
    enriched: DataFrame,
    group_col: str = "track_genre",
    date_col: str = "date",
    user_col: str = "user_id",
    measure_col: str = "duration_ms",
    approx_distinct: bool = False,
    approx_rsd: float = 0.01,
) -> DataFrame:
    """A1 + A2 + A5 (music-streaming-transform.py:100-106).

    Output schema matches schemas.GENRE_KPIS (with generic names mapped
    back to the reference's when called on the music schema).
    """
    distinct = (
        F.approx_count_distinct(user_col, approx_rsd)
        if approx_distinct
        else F.countDistinct(user_col)
    )
    return (
        enriched.groupBy(group_col, date_col)
        .agg(
            F.count("*").alias("listen_count"),
            distinct.alias("unique_listeners"),
            F.sum(measure_col).alias("total_listening_time_ms"),
            F.avg(measure_col).alias("avg_listening_time_ms"),
        )
        .withColumn(
            "avg_listening_time_per_user",
            F.col("total_listening_time_ms") / F.col("unique_listeners"),
        )
    )


def plays_per_item(
    enriched: DataFrame,
    group_cols: list[str],
    count_alias: str = "play_count",
) -> DataFrame:
    """A3/A4: count(*) at an arbitrary grain
    (music-streaming-transform.py:121-123, 145-147)."""
    return enriched.groupBy(*group_cols).agg(F.count("*").alias(count_alias))


# Alias matching the coarser-grain use (A4).
plays_per_group = plays_per_item


def fixed_width_histogram(
    df: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    width: float = 10.0,
    n_buckets: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column, optionally per group.

    Bucket k covers [lo + k*width, lo + (k+1)*width); values below
    ``lo`` clamp to bucket 0 and values past the top edge clamp to the
    last bucket (standard overflow-bin semantics). Emits bucket index,
    inclusive lower edge, and count. One hash-agg shuffle on
    (group, bucket) — cardinality n_buckets × |groups|, tiny no matter
    the input scale, which is the whole point: a 100 TB distribution
    profile reduced map-side to a few hundred rows.
    """
    v = F.col(value_col)
    bucket = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("bigint"), F.lit(0)
        ),
        F.lit(n_buckets - 1),
    )
    keys = list(group_cols or [])
    return (
        df.filter(v.isNotNull())
        .withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "bucket_lo", (F.lit(lo) + F.col("bucket") * F.lit(width))
        )
    )
