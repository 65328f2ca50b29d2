"""Sessionization: gap-based session windows over event streams.

Beyond the reference surface (its only temporal grain is the calendar
day, X2); sessions are the standard next step for listen-event
analytics and a stock capability of this engine:

- ``sessionize`` (batch): classic gap-split via window functions —
  ``lag`` the previous event time per user, flag gaps > threshold,
  running-sum the flags into a session ordinal. Pure built-ins,
  deterministic, SQL-expressible (so it oracle-checks exactly).
  One shuffle on the user key; the per-user sort rides the window.
- ``streaming_sessions``: the same semantics on an unbounded stream via
  the native ``F.session_window`` (state-store backed, watermark
  bounded) — merges events whose gaps are below the timeout into one
  growing window, emitting on watermark expiry.

Scale: sessionization shuffles on the entity key — the classic skew
victim (one bot user = one giant partition). The batch form composes
with salting only per-session-agg (not the ordinal assignment); the
real guard is a per-user event cap upstream. Streaming state is
bounded by (active entities × open sessions) and the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session ordinal per (user, gap-delimited run of events).

    Output: input columns + ``session_id`` (1-based ordinal per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-exact gap test (unix_timestamp would truncate to
    # whole seconds and mis-split sessions at fractional boundaries)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev_ts.cast("timestamp"))
            > gap_us
        ),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.floor(
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            )
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )


def streaming_sessions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming equivalent via the native session window: windows per
    user grow while events arrive within the gap and finalize once the
    watermark passes (state cleaned up automatically).

    ``session_end`` is the LAST EVENT's timestamp (``max(ts)``) —
    matching the batch ``session_stats`` bounds exactly, so the two
    surfaces reconcile row-for-row. Note Spark's raw ``win.end`` is
    last-event + gap (the window's expiry instant, e.g. a lone 10:00
    event with a 30-min gap gets win.end 10:30); that expiry bound is
    deliberately NOT what this returns."""
    gap = f"{gap_minutes} minutes"
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(user_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.max(ts_col).alias("_last_ts"),
        )
        .select(
            user_col,
            F.col("win.start").alias("session_start"),
            F.col("_last_ts").alias("session_end"),
            "n_events",
        )
    )
