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
   #partitions-sized relation, collected to the driver (bounded:
   one row per partition) and prefix-summed there;
3. add the local position with one Arrow ``mapInPandas`` kernel that
   looks its partition's offset up BY ``_pid`` in the collected dict
   and does ``offset + arange`` per batch — vectorized, no per-row
   Python, no second shuffle, and no join whose physical strategy the
   correctness could silently depend on (an earlier broadcast-join
   form relied on the join preserving partition alignment and
   intra-partition order — true for broadcast hash joins, but a
   optimizer strategy change would have corrupted positions with no
   guard; keying the kernel by ``_pid`` makes alignment structural).
   (The JVM-pure alternative — a window partitioned by
   ``spark_partition_id()`` — re-shuffles the full corpus a second
   time just to regroup rows it already holds; the kernel costs one
   Arrow pass instead.)

The ranged layout is pinned with an eager ``localCheckpoint`` between
the count pass and the numbering pass: ``repartitionByRange`` samples
its boundaries, so an unpinned plan could place boundary-adjacent rows
differently across the two subtrees. (Final ids are
boundary-invariant given a TOTAL order key, but the offsets must
describe the same physical layout the kernel walks.) Checkpoint
blocks free with the DataFrame instead of pinning a CacheManager
entry across calls — the trainers' discipline. At 100 TB prefer
reliable ``checkpoint()`` or derive boundaries from an exact
value-count histogram (aggregates.histogram_quantiles) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # eager checkpoint: pins the sampled range layout so the count
    # pass and the numbering pass walk the SAME physical placement,
    # and frees with the DataFrame (no persist leak across calls)
    ranged = (
        df.repartitionByRange(parts, *oc)
        .sortWithinPartitions(*oc)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    # exclusive prefix sum over the (bounded) #partitions-sized counts,
    # driver-side — no window, no join
    offsets: dict[int, int] = {}
    acc = int(start)
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = acc
        acc += int(row["_n"])

    # fresh StructType — StructType.add MUTATES in place, and
    # DataFrame.schema returns the df's cached schema object
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(seq_col, T.LongType())]
    )

    def number_partition(batches):
        # self-contained kernel (multimodal.py pickle-by-value rule);
        # offsets ship in the closure, keyed by _pid — alignment is
        # structural, not a property of a join's physical strategy
        import numpy as np

        pos = 0
        for pdf in batches:
            n = len(pdf)
            res = pdf.drop(columns=["_pid"])
            if n:
                off = offsets[int(pdf["_pid"].iloc[0])]
                res[seq_col] = off + pos + np.arange(n)
                pos += n
            else:
                res[seq_col] = np.array([], dtype="int64")
            yield res

    return ranged.mapInPandas(number_partition, schema=out_schema)
