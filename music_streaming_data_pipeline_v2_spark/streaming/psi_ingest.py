"""Drift monitoring at ingest: incrementally maintained PSI state.

The batch audit (operators/drift.py:psi_drift) re-bins the whole
corpus per call; a sharded ingest that wants a drift line per arriving
batch cannot. The observation that makes the incremental monitor exact
rather than approximate: PSI is a pure function of the (group, bin)
CELL COUNTS, and cell counts are additive across batches. So the only
state needed is:

- ``cells/`` — (grp, bin, cnt): each batch's group×bin histogram.
  Per-batch work is binning THAT batch once (one aggregate whose
  output is bounded by groups×bins, not rows); history is never
  re-binned.

The PSI itself is derived at query time by summing the stored cells
and handing them to the SAME ``psi_from_cells`` core the batch
operator uses (the index_ingest stance: derived statistics are not
stored, so the ingest path stays append-only, replays stay idempotent,
and the statistics are always exactly consistent with the state).

Delivery semantics: ``foreachBatch`` is at-least-once — the state is
partitioned by ``batch_id`` and each batch OVERWRITES its own
partition, so a replay rewrites identical content (dedup_ingest's
contract).

Equivalence contract: after draining any sequence of waves,
``query_psi`` over the accumulated state returns EXACTLY what
``psi_drift`` returns over the concatenation of all drained documents
(one shared arithmetic core; cell addition is exact integer math) —
the property tests/test_psi_ingest.py pins. The streaming layer's
correctness thereby inherits psi_drift's DuckDB oracle.
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
        T.StructField("source", T.StringType()),
    ]
)

#: Default binning: 64-char-wide length buckets capped at 8 — the same
#: deterministic binning the batch registry query uses, derived from
#: the text itself so JSONL ingest needs no precomputed n_chars column.
DEFAULT_BIN_SQL = "LEAST(CAST(LENGTH(text) DIV 64 AS INT), 8)"


def run_incremental_psi(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    schema: T.StructType | None = None,
    group_col: str = "source",
    bin_sql: str = DEFAULT_BIN_SQL,
    compact_after_drain: bool = False,
) -> None:
    """Drain ``input_path`` (JSON-lines doc files: doc_id, text,
    source) into the PSI cell state under ``work_dir`` (cells/,
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
        from ..operators.drift import bin_cells

        if batch_df.isEmpty():
            return
        # the SAME cell builder as the batch audit (incremental ≡
        # batch by construction); bins are stored as STRINGS so the
        # state schema is independent of the caller's bin_sql type —
        # PSI depends only on bin identity, and int→string is
        # injective, so the pin to psi_drift is unaffected
        cells = bin_cells(batch_df, group_col, F.expr(bin_sql)).select(
            "grp", F.col("bin").cast("string").alias("bin"), "cnt"
        )
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
            "grp string, bin string, cnt long",
            key_cols=["grp", "bin"],
            sum_cols=["cnt"],
            ckpt_dir=ckpt_dir,
        )


def query_psi(
    spark: SparkSession,
    work_dir: str,
    smoothing: float = 1.0,
) -> DataFrame:
    """PSI per group over everything drained so far — identical
    arithmetic to ``psi_drift`` (the shared ``psi_from_cells`` core),
    but summing the stored per-batch histograms instead of re-binning
    the corpus. Returns ``(grp, n_rows, psi)``.

    Plan: one sum over the state (bounded by batches×groups×bins rows
    — a compressed fraction of the corpus it summarizes) feeding the
    groups×bins PSI grid. Nothing re-reads raw text."""
    from ..operators.drift import psi_from_cells

    from .state import read_state_or_empty

    state = read_state_or_empty(
        spark,
        os.path.join(work_dir, "cells"),
        "grp string, bin string, cnt long",
    )
    merged = state.groupBy("grp", "bin").agg(F.sum("cnt").alias("cnt"))
    return psi_from_cells(merged, smoothing)


def query_ks(spark: SparkSession, work_dir: str) -> DataFrame:
    """Binned two-sample KS per group over everything drained so far —
    the SAME additive cell state query_psi reads, handed to the SAME
    ks_from_counts core the batch operator uses: one state, two drift
    statistics (PSI's weighted-divergence view and KS's worst-CDF-gap
    view), neither re-reading raw text. Returns
    ``(grp, n_g, n_rest, ks_num, ks_permille)``.

    Bins are stored as strings (PSI is order-blind); KS is a CDF
    statistic, so the readout casts them back to BIGINT — callers
    whose bin_sql is non-numeric must provide an orderable bin
    encoding to use this readout (lexicographic "10" < "2" would
    corrupt the CDF)."""
    from ..operators.drift import ks_from_counts

    from .state import read_state_or_empty

    state = read_state_or_empty(
        spark,
        os.path.join(work_dir, "cells"),
        "grp string, bin string, cnt long",
    )
    cnts = (
        state.groupBy("grp", "bin")
        .agg(F.sum("cnt").alias("c_g"))
        .select(
            F.col("grp").alias("g"),
            F.col("bin").cast("bigint").alias("v"),
            "c_g",
        )
    )
    return ks_from_counts(cnts).withColumnRenamed("g", "grp")
