"""Sequence-length (or any discrete-measure) quantile audits at
ingest: incrementally maintained value-count histogram cells.

The batch operator (operators/aggregates.py:histogram_quantiles) scans
the corpus per call; an ingest that wants the length distribution
as shards arrive cannot. Value-count cells are plain sums over value
occurrences, so they are ADDITIVE across batches — the count-min /
PSI cell contract. State:

- ``cells/`` — (value, _cnt): each batch's own count histogram,
  bounded by the batch's DISTINCT values, not its rows. History is
  never re-tokenized.

Quantiles are derived at query time by summing the stored cells and
handing them to the SAME ``quantiles_from_counts`` readout the batch
operator uses — derived statistics are not stored, the state stays
append-only, replays stay idempotent (batch_id-partitioned
overwrites).

Equivalence contract: after draining any sequence of waves,
``query_quantiles`` returns EXACTLY what ``histogram_quantiles``
returns over the concatenation of all drained rows (cell addition is
exact integer math; the readout is shared code) — pinned by
tests/test_hist_ingest.py. The streaming layer's correctness thereby
inherits ``doc_length_quantiles``'s DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def run_incremental_hist(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    schema: T.StructType | None = None,
    text_col: str = "text",
    compact_after_drain: bool = False,
) -> None:
    """Drain ``input_path`` (JSON-lines doc files: doc_id, text) into
    the token-length histogram state under ``work_dir`` (cells/,
    ckpt/). ``compact_after_drain=True`` folds the cell chain into
    the newest partition after the stream terminates
    (state.compact_additive_cells — exact, readout cost stops
    tracking drain count)."""
    cells_dir = os.path.join(work_dir, "cells")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    stream = (
        spark.readStream.schema(schema or DOC_SCHEMA)
        .format("json")
        .load(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.packing import engine_safe_tokens

        if batch_df.isEmpty():
            return
        # the SAME measure the batch quantile query ranks
        # (doc_length_quantiles): engine-safe token count, null-safe
        lens = batch_df.select(
            F.greatest(
                F.size(engine_safe_tokens(text_col)).cast("long"), F.lit(0)
            ).alias("value")
        )
        cells = lens.groupBy("value").agg(F.count("*").alias("_cnt"))
        cells.write.mode("overwrite").parquet(
            os.path.join(cells_dir, f"batch_id={batch_id}")
        )

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    if compact_after_drain:
        from .state import compact_additive_cells

        compact_additive_cells(
            spark,
            cells_dir,
            "value long, _cnt long",
            key_cols=["value"],
            sum_cols=["_cnt"],
            ckpt_dir=ckpt_dir,
        )


def query_quantiles(
    spark: SparkSession,
    work_dir: str,
    quantiles_permille: list[int],
) -> DataFrame:
    """Exact token-length quantiles over everything drained so far —
    identical readout to the batch path (``quantiles_from_counts``)
    over the cell-wise SUM of the stored per-batch histograms instead
    of a fresh corpus scan. Returns ``(q_permille, value)``.

    Plan: one sum over the state (bounded by batches × distinct
    values), then the shared bounded-histogram cumsum readout —
    nothing re-reads raw text."""
    from ..operators.aggregates import quantiles_from_counts
    from .state import read_state_or_empty

    state = read_state_or_empty(
        spark,
        os.path.join(work_dir, "cells"),
        "value long, _cnt long",
    )
    merged = state.groupBy("value").agg(F.sum("_cnt").alias("_cnt"))
    return quantiles_from_counts(merged, quantiles_permille)
