"""Sequence/funnel analytics over per-entity event streams.

Demonstrates the grouped-map Pandas UDF (``applyInPandas``): Spark
shuffles events by entity, hands each entity's rows to the kernel as
one Arrow-backed pandas frame, and the kernel does what window
functions express awkwardly — ordered sequence scans (funnels, Markov
transitions, regex-over-events). Output here is integer counts, so
results are exact and cross-engine checkable (the lag-window SQL twin
in plans/driver_queries.py).

Scale: one shuffle on the entity key; per-entity data must fit a
worker's memory (same bound as any per-entity window). A bot entity
with millions of events is the skew risk — cap per-entity rows
upstream or pre-aggregate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transition_counts(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    from_state: str = "click",
    to_state: str = "purchase",
) -> DataFrame:
    """Per-entity count of immediate ``from_state → to_state``
    transitions in event-time order."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        s = pdf[state_col].to_numpy()
        n = int(((s[:-1] == from_state) & (s[1:] == to_state)).sum()) if len(s) > 1 else 0
        return pd.DataFrame({entity_col: [pdf[entity_col].iloc[0]], "n_transitions": [n]})

    from pyspark.sql import types as T

    id_field = T.StructField(
        entity_col, events.schema[entity_col].dataType, True
    )
    out_schema = T.StructType(
        [id_field, T.StructField("n_transitions", T.LongType(), True)]
    )
    return events.select(entity_col, ts_col, state_col).groupBy(entity_col).applyInPandas(
        kernel, schema=out_schema
    )


def transition_counts_native(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    from_state: str = "click",
    to_state: str = "purchase",
) -> DataFrame:
    """JVM-native twin of ``transition_counts``: lead window + sum,
    whole-stage codegen, no Python workers — ~5× faster for this
    simple pattern. Reach for the pandas kernel only when the sequence
    logic outgrows window functions (regex-over-events, multi-step
    funnels with timeouts); identical results (equality-tested)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(entity_col).orderBy(ts_col)
    flagged = events.select(entity_col, ts_col, state_col).withColumn(
        "_hit",
        (
            (F.col(state_col) == from_state)
            & (F.lead(state_col).over(w) == to_state)
        ).cast("long"),
    )
    return flagged.groupBy(entity_col).agg(
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_transitions")
    )


def ewma_by_entity(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    alpha: float = 0.25,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-entity exponentially-weighted moving average — a true
    recurrence (``e_i = alpha*x_i + (1-alpha)*e_{i-1}``), which no
    window frame expresses: each output depends on the previous
    OUTPUT, not a previous input. The grouped-map kernel is the right
    tool: one shuffle on the entity key, then a sequential scan per
    entity (the same bound as any ordered window).

    Determinism: rows are ordered by (ts, order_col) so ties can't
    reorder, and the recurrence is evaluated in the same IEEE-double
    operation order as the SQL oracle's recursive CTE — results are
    bit-exact, not approximately equal. (pandas' ``ewm(adjust=False)``
    steps ``(1−α)·prev + α·x`` — the same two products as the CTE's
    ``α·x + (1−α)·prev``, and IEEE addition of two given doubles is
    commutative, so the Cython path preserves bit-exactness.)

    Physical shape: NOT one ``applyInPandas`` call per entity — with
    millions of small entities the per-group kernel-invocation
    overhead (Arrow slice + pandas frame per group) dominates the
    actual math (measured ~4× on sf0.1). Instead the events are hash-
    repartitioned by entity and sorted within partitions by (entity,
    ts, order), and ``mapInPandas`` processes each PARTITION with
    pandas' grouped Cython ewm — thousands of entities per kernel
    call. The memory bound moves from per-entity to per-partition;
    size partitions accordingly (``num_partitions``), exactly like
    sizing shuffle partitions for a sort.
    """
    from pyspark.sql import types as T

    sel = events.select(entity_col, ts_col, order_col, value_col).filter(
        F.col(value_col).isNotNull()
    )
    n_part = (
        num_partitions
        or sel.sparkSession.sparkContext.defaultParallelism
    )

    def kernel(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # partition is pre-sorted by (entity, ts, order); groupby with
        # sort=False keeps appearance order, so the flattened result
        # aligns 1:1 with pdf's rows
        ew = (
            pdf.groupby(entity_col, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .to_numpy()
        )
        yield pd.DataFrame(
            {
                entity_col: pdf[entity_col],
                order_col: pdf[order_col],
                "ewma": ew,
            }
        )

    schema = T.StructType(
        [
            T.StructField(entity_col, events.schema[entity_col].dataType, True),
            T.StructField(order_col, events.schema[order_col].dataType, True),
            T.StructField("ewma", T.DoubleType(), True),
        ]
    )
    return (
        sel.repartition(n_part, entity_col)
        .sortWithinPartitions(entity_col, ts_col, order_col)
        .mapInPandas(kernel, schema=schema)
    )


def session_attribution(
    events: DataFrame,
    gap_minutes: int = 30,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First-touch session attribution: sessionize each user's events
    (gaps-and-islands, < ``gap_minutes`` between neighbors — the same
    session definition user_sessions and session_window_native pin),
    attribute every ``target_type`` event to its session's FIRST
    event type, and report per initiating type how many sessions it
    opened and how much target value those sessions produced — the
    classic "which entry point converts" analytics question.

    Returns ``(first_type, n_sessions, n_targets, target_value)``
    with the money sum DECIMAL-exact (order-free) per the engine's
    money-column rule. Ordering inside a session is deterministic:
    (ts, order_col) — equal timestamps cannot flip the first touch
    across engines or partitionings.

    Scale: ONE user-keyed shuffle drives both windows (islands lag +
    running sum + first_value share the (user, ts, order) sort); the
    final aggregate is map-side-combinable over |event types| groups.
    No self-join, no session materialization."""
    from pyspark.sql import Window

    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(user_col, ts_col, type_col, order_col, value_col)
    wo = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # microsecond-exact gap test (sessions.py:sessionize rule — a
    # seconds cast truncates sub-second parts and can flip the island
    # break vs the oracle's epoch_us interval compare)
    mu = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = mu - F.lag(mu).over(wo)
    brk = F.when(
        gap.isNull() | (gap > gap_minutes * 60_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sid = F.sum(brk).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ws = Window.partitionBy(user_col, "sid").orderBy(ts_col, order_col)
    labeled = (
        base.withColumn("sid", sid)
        .withColumn(
            "first_type",
            F.first(type_col).over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    is_t = F.col(type_col) == target_type
    return (
        labeled.groupBy("first_type")
        .agg(
            F.count_distinct(user_col, "sid").alias("n_sessions"),
            F.count(F.when(is_t, F.lit(1))).cast("long").alias("n_targets"),
            F.coalesce(
                F.sum(
                    F.when(is_t, F.col(value_col).cast("decimal(18,2)"))
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).cast("double").alias("target_value"),
        )
    )
