"""Cardinality monitoring at ingest: incrementally maintained
HyperLogLog register state.

The batch sketch (operators/frequency.py:hll_distinct) scans the whole
corpus per call; a sharded ingest that wants per-group distinct-count
audits as data arrives cannot. The property that makes the incremental
sketch exact (identical to a batch build over everything drained): HLL
registers are MAXES of per-key rho values, so they are max-mergeable
across batches — max of per-batch maxes equals the max over the
concatenation. This is the count-min module's cell-additivity
contract with ``MAX`` in place of ``SUM``. State:

- ``registers/`` — (group, bucket, rho_max): each batch's own register
  aggregate, bounded by groups × m rows regardless of batch size.
  History is never re-hashed.

Estimates are derived at query time by max-merging the stored
registers and handing them to the SAME ``hll_estimate`` readout the
batch operator uses — derived statistics are not stored, the state
stays append-only, and replays stay idempotent.

Delivery semantics: ``foreachBatch`` is at-least-once — state is
partitioned by ``batch_id`` and each batch OVERWRITES its own
partition, so a replay rewrites identical content (md5 registers are
content-addressed).

Equivalence contract: after draining any sequence of waves,
``query_cardinality`` returns EXACTLY what ``hll_distinct`` returns
over the concatenation of all drained rows (register max-merge is
exact integer math; the estimate is a deterministic function of the
merged registers) — pinned by tests/test_round6_ops.py. The streaming
layer's correctness thereby inherits ``hll_distinct_users``'s DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("key", T.StringType()),
    ]
)

#: Register-addressing version: registers built under a different
#: HLL_P (or a different hash slicing) place the same key in different
#: buckets / draw rho from different bits — max-merging across schemes
#: silently corrupts estimates, so the state pins its scheme on first
#: drain (the sketch_ingest geometry contract).
HLL_ADDR_VERSION = 1


def _check_scheme(spark: SparkSession, work_dir: str, write: bool) -> None:
    from ..operators.frequency import HLL_P
    from .state import read_state_or_empty

    geo_dir = os.path.join(work_dir, "scheme")
    rows = read_state_or_empty(
        spark, geo_dir, "hll_p int, addr_version int"
    ).collect()
    if rows:
        got = (rows[0]["hll_p"], rows[0]["addr_version"])
        if got != (HLL_P, HLL_ADDR_VERSION):
            raise ValueError(
                f"hll state at {work_dir!r} was built with p={got[0]} "
                f"addressing v{got[1]}; this build uses p={HLL_P} "
                f"v{HLL_ADDR_VERSION} — registers are not mergeable "
                "across schemes, rebuild the state directory"
            )
        return
    if write:
        spark.createDataFrame(
            [(int(HLL_P), int(HLL_ADDR_VERSION))],
            "hll_p int, addr_version int",
        ).write.mode("overwrite").parquet(geo_dir)


def run_incremental_hll(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    schema: T.StructType | None = None,
    group_col: str = "group",
    key_col: str = "key",
    compact_after_drain: bool = False,
) -> None:
    """Drain ``input_path`` (JSON-lines files: group, key) into the
    HLL register state under ``work_dir`` (registers/, ckpt/).
    ``compact_after_drain=True`` folds the register chain into the
    newest partition (bucket-wise MAX — exactly the readout's merge,
    so estimates are bit-identical while readout cost stops tracking
    drain count)."""
    reg_dir = os.path.join(work_dir, "registers")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    _check_scheme(spark, work_dir, write=True)

    stream = (
        spark.readStream.schema(schema or KEY_SCHEMA)
        .format("json")
        .load(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.frequency import hll_registers

        if batch_df.isEmpty():
            return
        # the SAME register builder as the batch sketch (incremental ≡
        # batch by construction: md5 registers are content-addressed
        # and max-mergeable)
        regs = hll_registers(batch_df, key_col, [group_col])
        regs.write.mode("overwrite").parquet(
            os.path.join(reg_dir, f"batch_id={batch_id}")
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
            reg_dir,
            f"{group_col} string, bucket int, rho_max int",
            key_cols=[group_col, "bucket"],
            sum_cols={"rho_max": "max"},
            ckpt_dir=ckpt_dir,
        )


def query_cardinality(
    spark: SparkSession, work_dir: str, group_col: str = "group"
) -> DataFrame:
    """Per-group cardinality estimates over everything drained so far —
    identical readout to the batch path (``hll_estimate``) over the
    max-merge of the stored per-batch registers instead of a fresh
    corpus scan. Returns ``(group, v_empty, z_scaled, approx_count)``.

    Plan: one max-merge over the state (bounded by batches × groups ×
    m rows) and a broadcast join of the ≤ m-row linear-counting table
    — nothing re-reads raw keys."""
    from ..operators.frequency import hll_estimate
    from .state import read_state_or_empty

    _check_scheme(spark, work_dir, write=False)
    state = read_state_or_empty(
        spark,
        os.path.join(work_dir, "registers"),
        f"{group_col} string, bucket int, rho_max int",
    )
    merged = state.groupBy(group_col, "bucket").agg(
        F.max("rho_max").alias("rho_max")
    )
    return hll_estimate(merged, [group_col])
