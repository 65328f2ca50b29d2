"""Dense global sequence ids — the "give every document a training
position" primitive.

A 100 TB epoch shuffle needs each row numbered 0..n-1 in a
deterministic global order (e.g. by a per-epoch content-hash coin).
The naive ``row_number() OVER (ORDER BY ...)`` plans a SINGLE-PARTITION
window — the whole corpus through one reducer, the same trap the
two-phase NTILE/PCT_RANK and textrank fixes removed elsewhere in this
repo. ``monotonically_increasing_id`` is dense per partition but NOT
globally dense, and RDD ``zipWithIndex`` leaves the DataFrame world.

``dense_row_numbers`` is the two-phase DataFrame form of zipWithIndex:

1. range-repartition + sort within partitions on the order key —
   partition i holds a contiguous, internally-sorted key range;
2. per-partition counts → exclusive prefix-sum offsets — a
   #partitions-sized relation (the only single-partition window runs
   over THAT, never over rows);
3. broadcast the offsets back (map-side, order-preserving) and add the
   local position with one Arrow ``mapInPandas`` kernel that does
   ``offset + arange`` per batch — vectorized, no per-row Python, no
   second shuffle. (The JVM-pure alternative — a window partitioned by
   ``spark_partition_id()`` — re-shuffles the full corpus a second
   time just to regroup rows it already holds; the kernel costs one
   Arrow pass instead.)

The input is persisted between the count pass and the numbering pass:
``repartitionByRange`` samples its boundaries, so an unpinned plan
could place boundary-adjacent rows differently across the two
subtrees. (Final ids are boundary-invariant given a TOTAL order key,
but the offsets must describe the same physical layout the kernel
walks.) At 100 TB use DISK_ONLY persist or derive boundaries from an
exact value-count histogram (aggregates.histogram_quantiles) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dense_row_numbers"]


def dense_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Input columns plus ``seq_col`` = ``start`` + the row's rank in
    the global ``order_cols`` order. ``order_cols`` must be a TOTAL
    order (include a unique id as the last key) — with ties the
    numbering is still dense and valid but tie order follows physical
    placement.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    oc = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *oc)
        .sortWithinPartitions(*oc)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w), F.lit(0)) + F.lit(int(start))
    ).select("_pid", "_off")
    # broadcast hash join: map-side, preserves the sorted intra-partition
    # row order the kernel's running position depends on
    joined = ranged.join(F.broadcast(offsets), "_pid")

    # fresh StructType — StructType.add MUTATES in place, and
    # DataFrame.schema returns the df's cached schema object
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(seq_col, T.LongType())]
    )

    def number_partition(batches):
        # self-contained kernel (multimodal.py pickle-by-value rule)
        import numpy as np

        pos = 0
        for pdf in batches:
            n = len(pdf)
            res = pdf.drop(columns=["_pid", "_off"])
            if n:
                res[seq_col] = pdf["_off"].to_numpy() + pos + np.arange(n)
                pos += n
            else:
                res[seq_col] = np.array([], dtype="int64")
            yield res

    return joined.mapInPandas(number_partition, schema=out_schema)
