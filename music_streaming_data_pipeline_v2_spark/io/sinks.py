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


def write_kv_batched(
    df: DataFrame,
    client_factory,
    batch_size: int = 25,
) -> None:
    """Push a KV relation to an external store, client-batched per
    partition — the reference's DynamoDB load loop
    (glue_jobs/dynamodb-ingestion.py:133-167: ``batch_writer`` flushing
    25 items per request) re-expressed as a distributed sink.

    ``client_factory`` is a zero-argument picklable callable invoked
    ONCE PER PARTITION on the executor (never ship a live connection
    from the driver — sockets don't pickle); it returns an object with
    ``put_batch(items: list[dict]) -> None``. Rows stream through a
    fixed-size buffer, so executor memory per task is O(batch_size),
    not O(partition).

    Scale notes: parallelism = #partitions (repartition the KV frame to
    match the store's write-capacity sharding); per-batch retries/
    backoff belong in the client object, where boto3's batch_writer
    puts them; idempotency comes from pk/sk upserts, so replaying a
    micro-batch after a failure converges (same as the reference's
    overwrite-recompute model). ``toLocalIterator`` is deliberately NOT
    used — it would serialize the write through the driver.
    """

    def write_partition(rows) -> None:
        client = client_factory()
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                client.put_batch(buf)
                buf = []
        if buf:
            client.put_batch(buf)

    df.foreachPartition(write_partition)


class JsonDirKvClient:
    """File-backed KV-store fake with real client batching semantics.

    Stands in for a DynamoDB/Redis client in environments without one
    (this container): each ``put_batch`` appends one JSON line — the
    whole batch — to a process-unique file under ``root``, so a test
    can assert exactly how items were batched across executors.
    ``read_all``/``read_batches`` aggregate the directory back; last
    write wins per (pk, sk) is NOT modeled (append-only log), which is
    fine for the sink contract test.
    """

    def __init__(self, root: str) -> None:
        self.root = root

    def put_batch(self, items: list[dict]) -> None:
        import json
        import os
        import uuid

        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"{os.getpid()}-{uuid.uuid4().hex}.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(items, default=str) + "\n")

    def read_batches(self) -> list[list[dict]]:
        import json
        import os

        out: list[list[dict]] = []
        if not os.path.isdir(self.root):
            return out
        for name in sorted(os.listdir(self.root)):
            with open(os.path.join(self.root, name)) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    def read_all(self) -> list[dict]:
        return [item for batch in self.read_batches() for item in batch]


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
