"""Round-3 training-data pipeline batch: context-window chunking,
sequence packing, n-gram decontamination, balanced source sampling.

The between-curation-and-tokenizer shapes every LLM data pipeline runs
(operators/packing.py, text.py:ngram_contamination,
sampling.py:balanced_sample), each with a DuckDB oracle twin. All
tokenization uses the engine-portable whitespace class
``[ \\t\\n\\r\\f]+`` (ADVICE r2) so Spark/DuckDB split identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import _utc, q

from .oracle_shared import _BUCKET, _ORACLE_DECONTAM, _W  # noqa: F401

_ORACLE_CHUNKS = f"""
WITH t AS (
    SELECT doc_id, {_W} AS w FROM documents
),
s AS (
    SELECT doc_id, w,
           UNNEST(GENERATE_SERIES(0, GREATEST(LEN(w) - 9, 0), 16)) AS start
    FROM t
)
SELECT doc_id,
       start // 16 AS chunk_id,
       CAST(LEN(w[start + 1 : start + 24]) AS BIGINT) AS n_chunk_tokens,
       ARRAY_TO_STRING(w[start + 1 : start + 24], ' ') AS chunk_text
FROM s
"""


@q("doc_chunks", _ORACLE_CHUNKS)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: overlapping 24-token windows, stride 16
    (operators/packing.py:chunk_documents). Map-only sequence+slice
    explode — no shuffle, linear in bytes scanned."""
    from ..operators.packing import chunk_documents

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_tokens=24, overlap=8)
    return out.withColumn(
        "n_chunk_tokens", F.col("n_chunk_tokens").cast("long")
    )


_ORACLE_PACKING = f"""
WITH t AS (
    SELECT source AS stratum, doc_id,
           CAST(LEN({_W}) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT stratum, doc_id, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY stratum ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS start
    FROM t
)
SELECT stratum, doc_id, n_tokens,
       CAST(start // 64 AS BIGINT) AS bin_id,
       CAST(start % 64 AS BIGINT) AS bin_offset
FROM c
"""


@q("sequence_packing", _ORACLE_PACKING)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split example packing into 64-token bins per source
    (operators/packing.py:pack_sequences): each document is assigned
    the bin its first token lands in. One window shuffle per stratum;
    strata parallelize (a global pack would serialize — at scale you
    pack per shard, which the stratum expresses)."""
    from ..operators.packing import pack_sequences

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=64)




@q("ngram_decontamination", _ORACLE_DECONTAM)
def ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style decontamination over the engine's own hash split:
    distinct word 5-grams of each test-split document joined against
    the train split's grams (text.py:ngram_contamination) — the
    shuffle is gram-keyed, never doc×doc. n=13 is the published
    standard; n=5 here because the synthetic docs are ~23 tokens."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import ngram_contamination

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return ngram_contamination(
        docs.filter(b < 204), docs.filter(b >= 230), n=5
    )


_BUCKET_B = (
    "(INSTR('0123456789abcdef', SUBSTRING(MD5('b|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (INSTR('0123456789abcdef', SUBSTRING(MD5('b|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

_ORACLE_BALANCED = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
m AS (SELECT MIN(n) AS mn FROM c),
k AS (
    SELECT d.source, COUNT(*) AS n_after
    FROM documents d JOIN c USING (source), m
    WHERE {_BUCKET_B} < (m.mn / c.n) * 256
    GROUP BY d.source
)
SELECT c.source, c.n AS n_before, COALESCE(k.n_after, 0) AS n_after
FROM c LEFT JOIN k USING (source)
"""


@q("balanced_source_sample", _ORACLE_BALANCED)
def balanced_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform domain rebalancing: every source deterministically
    downsampled toward the smallest source's size by content-hash
    threshold (sampling.py:balanced_sample) — membership is a pure
    function of content + corpus composition, reproducible across
    engines and partitionings. Reports per-source before/after."""
    from ..operators.sampling import balanced_sample

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    before = docs.groupBy("source").agg(F.count("*").alias("n_before"))
    after = (
        balanced_sample(docs, "source", "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_after"))
    )
    return before.join(after, "source", "left").select(
        "source",
        "n_before",
        F.coalesce("n_after", F.lit(0).cast("long")).alias("n_after"),
    )


# 24-bit md5-hex hash (6 digits): wide enough that chance fp
# collisions are rare (16.7M values), so the overlap join's buckets
# stay thin; identical hex arithmetic in both engines.
_WINNOW_DIGITS = 6

_WINNOW_HASH = (
    "("
    + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTRING(MD5('7|' || gram), {j + 1}, 1)) - 1)"
        f" * {16 ** (_WINNOW_DIGITS - 1 - j)}"
        for j in range(_WINNOW_DIGITS)
    )
    + ")"
)


def _winnow_hash_col(c: F.Column) -> F.Column:
    """Spark twin of ``_WINNOW_HASH`` — same hex-digit arithmetic."""
    h = F.md5(F.concat(F.lit("7|"), c))
    out = F.lit(0).cast("long")
    for j in range(_WINNOW_DIGITS):
        hv = F.instr(F.lit("0123456789abcdef"), F.substring(h, j + 1, 1)) - 1
        out = out + hv.cast("long") * (16 ** (_WINNOW_DIGITS - 1 - j))
    return out

_ORACLE_WINNOW = f"""
WITH t AS (
    SELECT doc_id, {_W} AS w FROM documents
),
s AS (
    SELECT doc_id, w, UNNEST(RANGE(1, LEN(w) - 1)) AS i
    FROM t WHERE LEN(w) >= 3
),
g AS (
    SELECT doc_id, i AS pos, ARRAY_TO_STRING(w[i : i + 2], ' ') AS gram
    FROM s
),
h AS (SELECT doc_id, pos, {_WINNOW_HASH} AS hv FROM g),
r AS (
    SELECT doc_id,
           MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
    FROM h
)
SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp FROM r WHERE rn >= 4
"""


@q("winnowed_fingerprints", _ORACLE_WINNOW)
def winnowed_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowed rolling-hash sketches (word 3-grams, window
    4 — text.py:winnow_fingerprints): every 4-gram-hash window
    contributes its minimum, so any ≥6-token shared substring shows up
    in both documents' sketches — the LOCAL fingerprinting primitive
    whole-document hashing and MinHash both lack. Hash is the
    engine-portable 24-bit md5 hex arithmetic (seed 7) so the sketch
    is value-exact against the oracle."""
    from ..operators.text import winnow_fingerprints

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = winnow_fingerprints(docs, k=3, window=4, hash_fn=_winnow_hash_col)
    return out.withColumn("fp", F.col("fp").cast("long"))


_ORACLE_WINNOW_PAIRS = f"""
WITH t AS (
    SELECT doc_id, {_W} AS w FROM documents
),
s AS (
    SELECT doc_id, w, UNNEST(RANGE(1, LEN(w) - 1)) AS i
    FROM t WHERE LEN(w) >= 3
),
g AS (
    SELECT doc_id, i AS pos, ARRAY_TO_STRING(w[i : i + 2], ' ') AS gram
    FROM s
),
h AS (SELECT doc_id, pos, {_WINNOW_HASH} AS hv FROM g),
r AS (
    SELECT doc_id,
           MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
    FROM h
),
sk AS (SELECT DISTINCT doc_id, fp FROM r WHERE rn >= 4)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS n_shared_fps
FROM sk a JOIN sk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
"""


@q("winnow_overlap_pairs", _ORACLE_WINNOW_PAIRS)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap candidate pairs from the winnowed sketches:
    documents sharing ≥ 3 fingerprints (fp-keyed equi-join of the
    sketch relation, never doc×doc) — how a curation pipeline finds
    documents that EMBED each other's passages without being global
    near-dups. The 24-bit hash keeps chance fp collisions rare (and
    the join buckets thin); ≥3 shared fingerprints guards the
    residue. Production uses 64-bit hashes where any shared fp is
    meaningful."""
    from ..operators.text import winnow_fingerprints

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    # both join sides read the sketch — materialize it once
    sk = winnow_fingerprints(docs, k=3, window=4, hash_fn=_winnow_hash_col).persist()
    a = sk.select(F.col("doc_id").alias("id_a"), "fp")
    b = sk.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= 3)
    )


_ORACLE_RANK_ANALYTICS = """
WITH spend AS (
    SELECT o_custkey AS user_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
               AS total_spend
    FROM orders GROUP BY 1
)
SELECT user_id, total_spend,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, user_id ASC)
"""


@q("spend_rank_analytics", _ORACLE_RANK_ANALYTICS)
def spend_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ranking trio over per-customer spend: NTILE(4) /
    PERCENT_RANK / CUME_DIST on one shared global order (beyond the
    reference's row_number-only §2.5 surface).

    Scale design — two-phase global ranking, NO single-partition
    window: a naive ``Window.orderBy(...)`` with no partitionBy pulls
    the whole relation through one task (Spark warns exactly that).
    Instead:

    1. range-partition on the ORDER BY key (so partition *i* holds
       strictly higher-ranked rows than partition *i+1*) and rank
       LOCALLY with a window partitioned by the physical partition id
       — every partition ranks in parallel;
    2. ship only the per-partition row COUNTS to the driver (≤
       shuffle-partitions rows), prefix-sum them into offsets, and
       broadcast the offsets back as a literal map;
    3. global position = offset[pid] + local row_number, from which
       ntile/percent_rank/cume_dist are pure integer/IEEE arithmetic
       (the order is total — user_id tie-break — so rank = position
       and there are no peer groups; pct_rank/cume are the same two
       bigint divisions DuckDB performs, hence hash-exact doubles).

    The only serial structure left is the prefix sum over ≤ n_parts
    counts — O(n_parts) driver work at any data scale."""
    from pyspark.sql import Window

    _utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("total_spend")
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        spend.repartitionByRange(
            n_parts, F.desc("total_spend"), F.asc("user_id")
        )
        .withColumn("_pid", F.spark_partition_id())
        # Pin the physical layout: the counts job and the final job
        # must observe the SAME range boundaries, and re-executions
        # re-SAMPLE them (each exchange draws its own boundary sample
        # — verified: the single-plan formulation produces two
        # independent rangepartitioning exchanges, no ReusedExchange).
        # localCheckpoint rather than persist(): the materialized
        # blocks are released by the ContextCleaner when this
        # DataFrame is garbage collected, instead of pinning a
        # CacheManager entry for the session lifetime. Construction
        # therefore runs one Spark job (counts → driver prefix sum) —
        # the price of shipping offsets driver-side, documented above.
        .localCheckpoint(eager=False)
    )
    cnt_rows = ranked.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    n_total = sum(r["c"] for r in cnt_rows)
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(cnt_rows, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["c"]
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.desc("total_spend"), F.asc("user_id")
    )
    pos = (off_map[F.col("_pid")] + F.row_number().over(w_local)).cast("long")

    # NTILE(4) from global position: the first (n mod 4) buckets get
    # ceil(n/4) rows, the rest floor(n/4) — integer DIV keeps it exact
    quot, rem = divmod(n_total, 4)
    if quot == 0:  # fewer rows than buckets: bucket i = row i
        quartile = F.col("_pos")
    else:
        big = (quot + 1) * rem  # rows covered by the larger buckets
        quartile = F.when(
            F.col("_pos") <= big,
            F.expr(f"(_pos + {quot}) DIV {quot + 1}"),
        ).otherwise(F.expr(f"{rem} + (_pos - {big} + {quot - 1}) DIV {quot}"))
    return (
        ranked.withColumn("_pos", pos)
        .select(
            "user_id",
            "total_spend",
            quartile.cast("long").alias("quartile"),
            ((F.col("_pos") - 1) / F.lit(max(n_total - 1, 1))).alias("pct_rank"),
            (F.col("_pos") / F.lit(n_total)).alias("cume"),
        )
    )


_ORACLE_PROFILE = """
SELECT user_id,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT event_type)), ',') AS event_types,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


@q("user_event_type_profile", _ORACLE_PROFILE)
def user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation profile: each user's sorted distinct event
    types as one canonical string (collect_set → sort_array →
    concat_ws — the set-valued aggregate surface). Sorting before
    joining makes the value deterministic under any partitioning, so
    a collection-typed result is still hash-exact cross-engine."""
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    return events.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.count_distinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


@q("minhash_drop_stats")  # rows-only: counters over xxhash-seeded buckets
def minhash_drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH bucket-cap observability side-output as a
    one-row relation (dedup.py minhash_lsh_pairs with_stats=True):
    dropped_buckets / dropped_rows / dropped_candidate_pairs under an
    intentionally tight max_bucket, so the recall trade-off the cap
    makes is a measured, driver-recorded quantity rather than a silent
    truncation. max_bucket=2 because this corpus's band buckets are
    thin (near-dup groups are small) — the cap must actually bite at
    gate scale factors or the counters are vacuously zero (ADVICE r2's
    idle_rich lesson). No SQL oracle (buckets come from the
    engine-seeded xxhash family); the counters' arithmetic is
    unit-tested against a synthetic boilerplate corpus."""
    from ..operators import dedup as _dedup

    docs = load_table(spark, sf_dir, "documents")
    _pairs, stats = _dedup.minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, shingle_k=3,
        jaccard_threshold=0.3, max_bucket=2, with_stats=True,
    )
    return stats
