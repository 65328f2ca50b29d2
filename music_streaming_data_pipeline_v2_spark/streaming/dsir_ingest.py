"""DSIR-at-ingest: incrementally maintained importance-weight state.

Batch DSIR (operators/sampling.py:dsir_importance) re-featurizes the
whole raw pool per call; a curation pipeline that scores documents as
they arrive cannot — each micro-batch must fold into state without
re-reading history. The observation that makes this exact rather than
approximate: a document's log-weight is a pure function of its own
bucket-count vector and the two GLOBAL bucket distributions, and the
global raw distribution is itself just the sum of the per-doc vectors.
So the only state needed is:

- ``docbuckets/`` — (doc_id, bkt, cnt): each document's hashed-n-gram
  bucket counts. Per-batch work is featurizing THAT batch once;
  history is never re-scored at ingest.

The raw distribution is ONE 256-row aggregate over that state at
query time (the index_ingest.py stance: derived statistics are not
stored, so the ingest path stays append-only, replays stay idempotent,
and the statistics are always exactly consistent with the state). The
target corpus is a fixture, not a stream — its distribution is
computed per query call.

Delivery semantics: ``foreachBatch`` is at-least-once — the state is
partitioned by ``batch_id`` and each batch OVERWRITES its own
partition, so a replay rewrites identical content (dedup_ingest's
contract).

Equivalence contract: after draining any sequence of waves,
``query_dsir_scores`` over the accumulated state returns EXACTLY what
``dsir_importance`` returns over the concatenation of all drained
documents (integer-sum arithmetic on both paths; the per-occurrence
sum Σ lr equals the per-bucket sum Σ cnt·lr) — the property
tests/test_dsir_ingest.py pins. The streaming layer's correctness
thereby inherits dsir_importance's DuckDB oracle.
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

_NUM_BUCKETS = 256


def run_incremental_dsir(
    spark: SparkSession,
    input_path: str,
    work_dir: str,
    schema: T.StructType | None = None,
    compact_after_drain: bool = False,
) -> None:
    """Drain ``input_path`` (JSON-lines doc files: doc_id, text) into
    the DSIR state under ``work_dir`` (docbuckets/, ckpt/)."""
    from ..operators.sampling import _dsir_feature_buckets

    docbuckets_dir = os.path.join(work_dir, "docbuckets")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    stream = (
        spark.readStream.schema(schema or DOC_SCHEMA)
        .format("json")
        .load(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = (
            _dsir_feature_buckets(batch_df, "text", "doc_id", _NUM_BUCKETS)
            .groupBy("_doc", "bkt")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("_doc").alias("doc_id"), "bkt", "cnt")
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(docbuckets_dir, f"batch_id={batch_id}")
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

        # docs arrive once (the family's disjoint-arrival contract, the
        # same one the readout's plain union already relies on), so the
        # (doc, bucket) cells across batches are disjoint and the sum
        # fold is the identity on content — it only collapses the
        # partition chain
        compact_additive_cells(
            spark,
            docbuckets_dir,
            "doc_id long, bkt int, cnt long",
            key_cols=["doc_id", "bkt"],
            sum_cols=["cnt"],
            ckpt_dir=ckpt_dir,
        )


def query_dsir_scores(
    spark: SparkSession,
    work_dir: str,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance weights over every document drained so far —
    identical arithmetic (and the same scaled-BIGINT log-ratio table,
    via the shared ``dsir_log_ratio``) as ``dsir_importance``, but
    reading the stored bucket vectors instead of re-featurizing the
    corpus. Returns ``(id, n_feats, log_weight)``.

    Plan: the raw distribution is one 256-group aggregate over the
    state; the target distribution is featurized from the (small)
    target fixture; scoring is a 256-row broadcast join + a doc-keyed
    integer-sum aggregate. Nothing re-reads raw TEXT — at 100 TB the
    state is the compressed (doc, bkt, cnt) relation, bucket-prunable
    and a fraction of the corpus it summarizes."""
    from ..operators.sampling import _dsir_feature_buckets, dsir_log_ratio

    from .state import read_state_or_empty

    # explicit schema + FS-agnostic absent-path handling via the
    # shared state reader: an undrained (or all-empty-batches) state
    # is a legitimate "nothing scored yet" relation, not a crash
    # (ADVICE r4 / the semantic_ingest lesson)
    db = read_state_or_empty(
        spark,
        os.path.join(work_dir, "docbuckets"),
        "doc_id long, bkt int, cnt long",
    )
    r_cnt = db.groupBy("bkt").agg(F.sum("cnt").alias("rc"))
    t_cnt = (
        _dsir_feature_buckets(target, text_col, id_col, _NUM_BUCKETS)
        .groupBy("bkt")
        .agg(F.count("*").alias("tc"))
    )
    lr = dsir_log_ratio(r_cnt, t_cnt, _NUM_BUCKETS)
    return (
        db.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("_lr_i")).alias("_sum"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "n_feats",
            (F.col("_sum").cast("double") / F.lit(1e9)).alias("log_weight"),
        )
    )
