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


def prune_snapshots(
    spark: SparkSession, state_dir: str, keep_latest: int = 1
) -> list[int]:
    """Partition-deletion maintenance for state whose newest partition
    is SELF-CONTAINED — today that means a ``read_resolved_labels``
    relation immediately after ``compact_label_deltas`` folded it
    (which calls this). Deletes all but the ``keep_latest`` newest
    ``batch_id=`` partitions through the Hadoop FileSystem API (any
    scheme the session can write — the pipeline-cleanup convention,
    never a driver-local rmtree). Returns the deleted batch ids.
    Do NOT call directly on an un-compacted delta chain: older
    partitions there still hold live label rows.

    Safe under at-least-once replay only between drains (not
    mid-stream), which is also when a maintenance job would run.
    Never deletes the newest ``keep_latest`` (≥ 1 enforced)."""
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


def latest_batch_id(
    spark: SparkSession, state_dir: str, before_batch: int | None = None
) -> int | None:
    """Highest committed ``batch_id=`` partition of a state directory
    (FS listing, no Spark job), or None when the directory is absent
    or empty — the freshness probe snapshot consumers use to detect a
    snapshot that lags its additive source (e.g. comps/ behind pairs/
    after drains ran with maintenance disabled). ``before_batch``
    restricts to partitions strictly older — the recovery-isolation
    view a replaying batch must use (a crashed prior attempt at the
    CURRENT batch may have left its own partition behind)."""
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
            if before_batch is not None and b >= before_batch:
                continue
            best = b if best is None else max(best, b)
    return best


def read_resolved_labels(
    spark: SparkSession,
    state_dir: str,
    schema: str | T.StructType,
    key_col: str = "id",
    before_batch: int | None = None,
) -> tuple[DataFrame, int] | None:
    """DELTA-style snapshot state (VERDICT r7 #3): each ``batch_id=``
    partition holds only the rows that batch CHANGED (new keys + keys
    whose value was remapped; a self-heal bootstrap writes every key),
    so the per-drain WRITE is bounded by the touched delta, never the
    accumulated labeling — the property the old whole-snapshot layout
    violated at the 100 TB target. The current labeling is
    last-writer-wins per key: one hash aggregate (``max_by`` over
    ``batch_id``) across every committed partition before
    ``before_batch``. An empty partition is a legitimate no-change
    marker (it still advances the freshness probe), which is why the
    latest id comes from the DIRECTORY listing, not the data. Returns
    ``(resolved labeling, latest batch id)`` or None when no partition
    exists — callers bootstrap from the additive state.

    Read cost grows with the delta chain until ``compact_label_deltas``
    folds it; write cost per drain is the delta alone. That trade
    (merge-on-read + periodic compaction) is the standard one and the
    point of the layout."""
    latest = latest_batch_id(spark, state_dir, before_batch)
    if latest is None:
        return None
    df = spark.read.schema(_with_batch_id(schema)).parquet(state_dir)
    df = df.filter(F.col("batch_id") <= F.lit(latest))
    base = spark.createDataFrame([], schema)
    value_cols = [c for c in base.columns if c != key_col]
    resolved = (
        df.groupBy(key_col)
        .agg(F.max_by(F.struct(*value_cols), "batch_id").alias("_v"))
        .select(
            key_col, *[F.col(f"_v.{c}").alias(c) for c in value_cols]
        )
    )
    return resolved, latest


def compact_label_deltas(
    spark: SparkSession,
    state_dir: str,
    schema: str | T.StructType,
    key_col: str = "id",
) -> list[int]:
    """Fold a ``read_resolved_labels`` delta chain: resolve the
    current labeling, rewrite it into the NEWEST partition (now a
    full self-contained labeling — exactly what a bootstrap writes),
    and delete every older partition. Bounds the merge-on-read cost
    between maintenance runs; returns the deleted batch ids.

    Same safety contract as ``prune_snapshots``: run only BETWEEN
    drains (stream terminated ⇒ checkpoint committed ⇒ the newest
    batch can no longer replay; a replay of batch N rewrites only
    N's DELTA, which would silently drop the folded history). The
    resolved labeling is materialized (eager localCheckpoint) before
    the overwrite — the write otherwise reads the very partition it
    is replacing."""
    res = read_resolved_labels(spark, state_dir, schema, key_col)
    if res is None:
        return []
    resolved, latest = res
    resolved = resolved.localCheckpoint(eager=True)
    resolved.write.mode("overwrite").parquet(
        f"{state_dir}/batch_id={latest}"
    )
    return prune_snapshots(spark, state_dir, keep_latest=1)
