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
