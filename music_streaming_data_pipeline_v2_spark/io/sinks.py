"""Batch sinks.

The reference writes each KPI table with ``coalesce(1)`` (reference
glue_jobs/music-streaming-transform.py:170-178) — a single-partition write
that serializes the whole job through one task. This engine never does
that: outputs keep natural partitioning, or are partitioned by a column
(date) so daily recompute is a dynamic partition overwrite — the Spark
equivalent of the reference's idempotent recompute-a-day model
(music-streaming-transform.py:82-85 + mode('overwrite')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a result table, optionally partitioned.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by the
    session factory) an overwrite touches only the partitions present in
    ``df`` — re-running one day replaces one day, not the table.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_partitions(
    spark,
    path: str,
    partition_by: list[str],
    target_rows_per_file: int = 1_000_000,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction for a partitioned table — the maintenance
    pass every streaming/incremental sink needs at scale: micro-batch
    writes leave one file per (trigger × partition × task), and scan
    throughput collapses when a 100 TB table is millions of KB-sized
    files (per-file open cost + tiny row groups defeat the columnar
    format).

    Rewrites the dataset with one shuffle keyed on the partition
    columns, letting ``maxRecordsPerFile`` split oversized partitions
    into multiple right-sized files. The rewrite goes through a temp
    sibling directory + atomic-ish rename so a failed compaction never
    destroys the live data (the same overwrite-safety the reference gets
    from archive-then-delete, dags/tasks/utils.py:137-211). Dynamic
    partition overwrite is NOT enough here because compaction must
    rewrite partitions in place while other readers may list the
    directory; for table formats (Delta/Iceberg) this whole function is
    their OPTIMIZE/rewrite_data_files action.
    """
    import os
    import shutil

    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "._compacting"
    (
        df.repartition(*partition_by)
        .write.mode("overwrite")
        .format(fmt)
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_by)
        .save(tmp)
    )
    old = path.rstrip("/") + "._pre_compact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
