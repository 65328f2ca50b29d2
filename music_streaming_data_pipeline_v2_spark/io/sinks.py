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
