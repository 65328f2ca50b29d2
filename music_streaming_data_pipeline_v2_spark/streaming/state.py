"""Shared batch-partitioned state access for the ingest indexes.

Every incremental pipeline in this package stores its state the same
way: parquet partitioned by ``batch_id=``, each batch OVERWRITING its
own partition (at-least-once replays rewrite identical content). This
module is the ONE reader for that layout:

- **explicit schema, always** — state reads must never depend on data
  files existing; a batch that commits an empty partition (zero
  leaders, all-duplicate lines) leaves ``_SUCCESS`` only, and
  inference-based reads crash on it (ADVICE r4 / the semantic_ingest
  lesson).
- **absent path = empty state, through Spark's reader** — the probe
  must NOT be a driver-local ``os.path`` check: state on any
  Hadoop-compatible filesystem (object stores at the 100 TB target)
  then silently reads as "nothing ingested yet". A PATH_NOT_FOUND from
  the reader is the legitimate empty case; everything else re-raises.
- **partition-pruned recovery isolation** — ``before_batch`` excludes
  the CURRENT batch's partition, so a crashed prior attempt's partial
  write can never feed its own retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_batch_id(schema: str | T.StructType) -> str | T.StructType:
    if isinstance(schema, T.StructType):
        return T.StructType(
            list(schema.fields) + [T.StructField("batch_id", T.IntegerType())]
        )
    return schema + ", batch_id int"


def read_state_or_empty(
    spark: SparkSession,
    state_dir: str,
    schema: str | T.StructType,
    before_batch: int | None = None,
) -> DataFrame:
    """Read ``state_dir`` (batch_id-partitioned parquet) with
    ``schema`` explicitly declared; an absent path returns the empty
    typed relation. ``before_batch`` prunes to committed prior
    batches (``None`` reads everything — the query-time view)."""
    try:
        df = spark.read.schema(_with_batch_id(schema)).parquet(state_dir)
    except Exception as exc:  # PATH_NOT_FOUND → no state yet
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        return spark.createDataFrame([], schema)
    if before_batch is not None:
        df = df.filter(F.col("batch_id") < F.lit(before_batch))
    return df.drop("batch_id")


def read_latest_snapshot(
    spark: SparkSession,
    state_dir: str,
    schema: str | T.StructType,
    before_batch: int | None = None,
) -> tuple[DataFrame, int] | None:
    """Snapshot-style state: unlike the additive relations
    ``read_state_or_empty`` serves (cells, pairs, postings — whose
    partitions SUM), a snapshot partition REPLACES its predecessors
    (component labelings: a new pair can merge two old components, so
    labels are not additive). Returns ``(frame, batch_id)`` for the
    newest committed partition strictly before ``before_batch``
    (``None`` = newest overall, the query-time view), or ``None`` when
    no snapshot exists — callers bootstrap from the additive state.

    The max-batch probe is a Hadoop FileSystem directory listing (any
    scheme the session can reach — the prune_snapshots convention; a
    Spark max(batch_id) aggregate here costs a whole job per drain,
    measured material on high-job-latency hosts), then the snapshot
    read targets exactly one partition directory — so query cost
    tracks the CURRENT labeling size, never the batch count."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_dir)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm_path.getFileSystem(hconf)
    if not fs.exists(jvm_path):
        return None
    batches = []
    for st in fs.listStatus(jvm_path):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if before_batch is None or b < before_batch:
                batches.append(b)
    if not batches:
        return None
    latest = max(batches)
    df = spark.read.schema(schema).parquet(
        f"{state_dir}/batch_id={latest}"
    )
    return df, latest


def prune_snapshots(
    spark: SparkSession, state_dir: str, keep_latest: int = 1
) -> list[int]:
    """Maintenance for snapshot-style state (``read_latest_snapshot``
    relations, e.g. dedup_ingest's ``comps/``): only the newest
    partition is ever read, so older snapshots are pure storage
    garbage — at 100 TB a labeling ∝ corpus pairs re-written per drain
    accumulates fast. Deletes all but the ``keep_latest`` newest
    ``batch_id=`` partitions through the Hadoop FileSystem API (any
    scheme the session can write — the pipeline-cleanup convention,
    never a driver-local rmtree). Returns the deleted batch ids.

    Safe under at-least-once replay: a replayed batch N reads the
    newest snapshot < N; pruning keeps the newest, and a replay of the
    CURRENT batch never reads its own partition — so prune only
    between drains (not mid-stream), which is also when a maintenance
    job would run. Never deletes the newest ``keep_latest`` (≥ 1
    enforced)."""
    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1")
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_dir)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm_path.getFileSystem(hconf)
    if not fs.exists(jvm_path):
        return []
    batches = []
    for st in fs.listStatus(jvm_path):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            try:
                batches.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    doomed = sorted(batches)[:-keep_latest]
    for b in doomed:
        p = spark._jvm.org.apache.hadoop.fs.Path(
            state_dir, f"batch_id={b}"
        )
        fs.delete(p, True)
    return doomed


def latest_batch_id(spark: SparkSession, state_dir: str) -> int | None:
    """Highest committed ``batch_id=`` partition of a state directory
    (FS listing, no Spark job), or None when the directory is absent
    or empty — the freshness probe snapshot consumers use to detect a
    snapshot that lags its additive source (e.g. comps/ behind pairs/
    after drains ran with maintenance disabled)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(state_dir)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm_path.getFileSystem(hconf)
    if not fs.exists(jvm_path):
        return None
    best = None
    for st in fs.listStatus(jvm_path):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            best = b if best is None else max(best, b)
    return best
