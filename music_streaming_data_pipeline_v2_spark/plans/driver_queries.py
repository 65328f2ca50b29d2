"""Driver-contract queries: every operator from SURVEY.md §2, expressed on
the /root/testdata tables, each with a DuckDB oracle-SQL twin.

Role mapping (FIXTURES.md §B): ``events`` stands in for the streams fact
(``event_type`` = genre-like key, ``to_date(ts)`` = daily grain), and
``customer`` for the users dimension (``user_id = c_custkey``); the
TPC-H-ish tables exercise the relational operators at bench scale.

Cross-engine exactness strategy (SURVEY.md §7 hard parts (a)/(c)):
Spark and DuckDB must hash-identically, so every aggregated numeric is
either (1) an integer count, (2) a sum over DECIMAL-cast inputs —
exact and order-independent in both engines (the source doubles are
2-decimal money values, so the cast loses nothing) — optionally cast to
double at the end (one deterministic conversion), or (3) a ratio of
those computed by one IEEE double division (deterministic given equal
operands). Nondeterministic row_number ties are broken with explicit
key columns in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a rows-only check


REGISTRY: dict[str, Q] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Q(fn, oracle)
        return fn

    return deco


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# Enrichment + daily KPIs (reference J1/J2, P11, A1/A2/A5 — SURVEY §2.3/§2.4)
# ---------------------------------------------------------------------------

def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events fact with its NANOS timestamp made Spark-native.

    The driver parquet stores ``ts`` as TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; read it as a nanos long (legacy conf) and
    convert to the engine's µs TimestampType — the same ns→µs downcast
    the reference does in pandas (dags/tasks/utils.py:73-75).
    """
    _utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = load_table(spark, sf_dir, "events")
    return events.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def _enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 analog: fact ⋈ broadcast dim, inner (unknown users dropped,
    music-streaming-transform.py:65-76), plus the P11 date column."""
    events = load_events(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "inner"
    ).withColumn("date", F.to_date("ts"))


def _dec_sum(col: str = "value") -> F.Column:
    """Order-independent exact sum: decimal-cast the 2-decimal doubles."""
    return F.sum(F.col(col).cast("decimal(18,2)"))


_ORACLE_DAILY_KPIS = """
SELECT event_type,
       CAST(ts AS DATE) AS date,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(DISTINCT user_id)
           AS avg_value_per_user
FROM events JOIN customer ON user_id = c_custkey
GROUP BY event_type, CAST(ts AS DATE)
"""


@q("daily_kpis", _ORACLE_DAILY_KPIS)
def daily_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A5 analog of daily genre KPIs
    (music-streaming-transform.py:100-106)."""
    return (
        _enriched_events(spark, sf_dir)
        .groupBy("event_type", "date")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dec_sum().cast("double").alias("total_value"),
        )
        .withColumn("avg_value", F.col("total_value") / F.col("n_events"))
        .withColumn("avg_value_per_user", F.col("total_value") / F.col("n_users"))
        .select(
            "event_type", "date", "n_events", "n_users",
            "total_value", "avg_value", "avg_value_per_user",
        )
    )


_ORACLE_TOP_USERS = """
WITH plays AS (
    SELECT event_type, CAST(ts AS DATE) AS date, user_id,
           COUNT(*) AS play_count
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY event_type, CAST(ts AS DATE), user_id
)
SELECT event_type, date, rank, user_id, play_count
FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY event_type, date
        ORDER BY play_count DESC, user_id ASC) AS INTEGER) AS rank
    FROM plays
)
WHERE rank <= 3
"""


@q("top_users_per_type_day", _ORACLE_TOP_USERS)
def top_users_per_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+A3+P7 analog of top-3 songs per genre-day
    (music-streaming-transform.py:115-133), tie-broken by user_id."""
    plays = (
        _enriched_events(spark, sf_dir)
        .groupBy("event_type", "date", "user_id")
        .agg(F.count("*").alias("play_count"))
    )
    w = Window.partitionBy("event_type", "date").orderBy(
        F.desc("play_count"), F.asc("user_id")
    )
    return (
        plays.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "date", "rank", "user_id", "play_count")
    )


_ORACLE_TOP_TYPES = """
WITH totals AS (
    SELECT CAST(ts AS DATE) AS date, event_type, COUNT(*) AS total_plays
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY CAST(ts AS DATE), event_type
)
SELECT date, rank, event_type, total_plays
FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY date ORDER BY total_plays DESC, event_type ASC) AS INTEGER) AS rank
    FROM totals
)
WHERE rank <= 5
"""


@q("top_types_per_day", _ORACLE_TOP_TYPES)
def top_types_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+A4+P7 analog of top-5 genres per day
    (music-streaming-transform.py:139-160), tie-broken by event_type."""
    totals = (
        _enriched_events(spark, sf_dir)
        .groupBy("date", "event_type")
        .agg(F.count("*").alias("total_plays"))
    )
    w = Window.partitionBy("date").orderBy(
        F.desc("total_plays"), F.asc("event_type")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("date", "rank", "event_type", "total_plays")
    )
