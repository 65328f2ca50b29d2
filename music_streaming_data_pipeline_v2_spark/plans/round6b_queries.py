"""Round-6 continuation batch: corpus-distribution primitives.

Three operator families a 100 TB training-data pipeline needs that the
registry did not yet cover:

- **Worker sharding** (``operators/sharding.py``): rendezvous/HRW
  assignment of documents to N training workers — map-only,
  coordination-free, and minimally disruptive under worker-count
  changes (the property ``rendezvous_stability`` pins with an exact
  integer permille).
- **Per-domain quotas** (``sampling.group_cap_sample``): RefinedWeb's
  cap-per-registrable-domain, implemented WITHOUT a group-sized rank
  window (bucket-threshold two phases; the oracle is the naive window,
  so every driver row re-proves the two-phase ≡ window equivalence).
- **Phrase blocklists** (``quality.phrase_blocklist_gate``): the
  multi-token half of the C4 §2.2 gate (whole-token single terms were
  round 6's ``blocklist_gate_docs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import q

# ---------------------------------------------------------------------------
# Rendezvous sharding
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_N_SHARDS_AFTER = 9

#: DuckDB replay of rendezvous_shard: shard cross-join, argmax by
#: (md5 weight, shard) via ROW_NUMBER DESC — the relational form of the
#: map-only struct-array argmax.
_HRW_CTE = """
s{n} AS (SELECT UNNEST(RANGE({n})) AS shard),
a{n} AS (
    SELECT d.doc_id, s{n}.shard,
           MD5('hrw|' || CAST(s{n}.shard AS VARCHAR) || '|'
               || CAST(d.doc_id AS VARCHAR)) AS h
    FROM documents d CROSS JOIN s{n}
),
w{n} AS (
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY h DESC, shard DESC
           ) AS rn
    FROM a{n}
)
"""

_ORACLE_RENDEZVOUS = f"""
WITH {_HRW_CTE.format(n=_N_SHARDS)}
SELECT shard, COUNT(*) AS n_docs
FROM w{_N_SHARDS} WHERE rn = 1
GROUP BY shard
"""


@q("rendezvous_shards", _ORACLE_RENDEZVOUS)
def rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard document counts under rendezvous (HRW) assignment to
    8 workers (operators/sharding.py). The Spark side is one map-only
    struct-array argmax per row — no shuffle before the final count —
    while the oracle replays the argmax relationally, so the hash
    match proves the two forms agree weight for weight."""
    from ..operators.sharding import rendezvous_assign

    docs = load_table(spark, sf_dir, "documents")
    return (
        rendezvous_assign(docs, "doc_id", _N_SHARDS)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"))
    )


_ORACLE_STABILITY = f"""
WITH {_HRW_CTE.format(n=_N_SHARDS)},
{_HRW_CTE.format(n=_N_SHARDS_AFTER)},
b AS (SELECT doc_id, shard FROM w{_N_SHARDS} WHERE rn = 1),
c AS (SELECT doc_id, shard FROM w{_N_SHARDS_AFTER} WHERE rn = 1)
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN b.shard <> c.shard THEN 1 ELSE 0 END)
           AS BIGINT) AS n_moved,
       CAST((1000 * SUM(CASE WHEN b.shard <> c.shard THEN 1 ELSE 0 END))
           // COUNT(*) AS BIGINT) AS moved_permille
FROM b JOIN c USING (doc_id)
"""


@q("rendezvous_stability", _ORACLE_STABILITY)
def rendezvous_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-disruption audit for the worker resize 8 → 9: exact
    count (and integer permille) of documents whose HRW shard changes.
    Rendezvous moves ~1/9 ≈ 111‰ (only ids whose NEW worker's weight
    wins); modulo hashing would move ~8/9 of the corpus. One scan, two
    map-only assignment expressions, one global aggregate."""
    from ..operators.sharding import shard_movement

    docs = load_table(spark, sf_dir, "documents")
    return shard_movement(docs, "doc_id", _N_SHARDS, _N_SHARDS_AFTER)


# ---------------------------------------------------------------------------
# Per-domain cap
# ---------------------------------------------------------------------------

_CAP = 15

_ORACLE_DOMAIN_CAP = f"""
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5('c|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= {_CAP}
"""


@q("per_domain_cap_sample", _ORACLE_DOMAIN_CAP)
def per_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb per-domain quota: at most 15 documents per source,
    selected by content hash (sampling.group_cap_sample). The Spark
    plan never rank-windows a whole group — hash-prefix cells, a
    broadcast threshold join, and a window over ONLY each group's
    threshold cell (bucket_hex_digits=1 → 16 cells, so the partial
    cell is non-trivially exercised at every sf). The oracle is the
    naive per-group ROW_NUMBER, making each driver row an equivalence
    proof of the two-phase plan."""
    from ..operators.sampling import group_cap_sample

    docs = load_table(spark, sf_dir, "documents")
    return group_cap_sample(
        docs, "source", "doc_id", _CAP, bucket_hex_digits=1
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# Phrase blocklist
# ---------------------------------------------------------------------------

_PHRASES = ["fast table", "table table", "slow fast", "value fast"]

_PHRASE_LIST = "[" + ", ".join(f"' {p} '" for p in _PHRASES) + "]"

_ORACLE_PHRASE_GATE = f"""
SELECT doc_id, n_blocked_phrases, n_blocked_phrases = 0 AS keep
FROM (
    SELECT doc_id,
           CASE WHEN text IS NULL THEN 0
                ELSE LEN(LIST_FILTER(
                    {_PHRASE_LIST},
                    p -> CONTAINS(
                        ' ' || REGEXP_REPLACE(
                            LOWER(TRIM(text)), '[ \\t\\n\\r\\f]+', ' ', 'g'
                        ) || ' ',
                        p
                    )
                )) END AS n_blocked_phrases
    FROM documents
)
"""


@q("phrase_blocklist_docs", _ORACLE_PHRASE_GATE)
def phrase_blocklist_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-token C4 blocklist gate: distinct blocked PHRASES per
    document under whole-token-boundary matching
    (quality.phrase_blocklist_gate) — map-only literal-array probes,
    zero shuffles, the same linear-scan profile as the single-term
    gate it completes."""
    from ..operators.quality import phrase_blocklist_gate

    docs = load_table(spark, sf_dir, "documents")
    return phrase_blocklist_gate(docs, _PHRASES).select(
        "doc_id", "n_blocked_phrases", "keep"
    )


# ---------------------------------------------------------------------------
# Python DataSource connector (Spark 4 custom-source surface)
# ---------------------------------------------------------------------------

_DS_N, _DS_LO, _DS_HI = 4_000, 500, 3_500

_ORACLE_PYDS = f"""
WITH g AS (SELECT UNNEST(RANGE({_DS_LO}, {_DS_HI})) AS id),
r AS (
    SELECT id,
           (STRPOS('0123456789abcdef',
                   SUBSTRING(MD5('ds|' || CAST(id AS VARCHAR)), 1, 1)) - 1)
               * 16
         + (STRPOS('0123456789abcdef',
                   SUBSTRING(MD5('ds|' || CAST(id AS VARCHAR)), 2, 1)) - 1)
               AS bucket,
           (id * 2654435761 + 40503) % 1000003 AS value
    FROM g
)
SELECT ['en', 'de', 'fr', 'es', 'zh'][(bucket % 5) + 1] AS lang,
       COUNT(*) AS n_rows,
       CAST(SUM(value) AS BIGINT) AS sum_value
FROM r GROUP BY 1
"""


@q("python_datasource_agg", _ORACLE_PYDS)
def python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads the custom Python DataSource (io/pydatasource.py — the
    Spark 4 `pyspark.sql.datasource` connector surface) under a range
    predicate that the source's ``pushFilters`` consumes: the pruned
    ids are never GENERATED (true pushdown, the executed plan's only
    residual filter is isnotnull). The generator's fields are md5 +
    multiply-mod integer arithmetic, so the DuckDB oracle replays the
    connector's whole output from ``generate_series`` — connector,
    pushdown window, and aggregate all pinned by one hash match.
    ``sf_dir`` is unused: the source IS the data."""
    from pyspark.sql import functions as F

    from ..io.pydatasource import register_synthetic

    register_synthetic(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", _DS_N)
        .option("parts", 8)
        .load()
    )
    return (
        df.filter((F.col("id") >= _DS_LO) & (F.col("id") < _DS_HI))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("value").cast("long").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Dense global sequence ids (epoch-shuffle positions)
# ---------------------------------------------------------------------------

_ORACLE_EPOCH_SHUFFLE = """
SELECT doc_id,
       ROW_NUMBER() OVER (
           ORDER BY MD5('e|1|' || CAST(doc_id AS VARCHAR)), doc_id
       ) - 1 AS seq
FROM documents
"""


@q("epoch_shuffle_positions", _ORACLE_EPOCH_SHUFFLE)
def epoch_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized global shuffle order for training epoch 1: every
    document's dense position 0..n-1 under the 'e|1|' content-hash
    coin (operators/ids.py:dense_row_numbers). The oracle is the
    single-partition ROW_NUMBER the operator exists to avoid — the
    Spark plan's only row-count-sized stages are a range exchange and
    an Arrow offset+arange kernel, with the one global window running
    over the #partitions-row offsets relation."""
    from ..operators.ids import dense_row_numbers

    # explicit projection BEFORE the kernel boundary: mapInPandas is a
    # pruning barrier, so an un-projected input would drag `text`
    # through the range shuffle and the Arrow kernel
    docs = load_table(spark, sf_dir, "documents").select("doc_id").withColumn(
        "_coin", F.md5(F.concat(F.lit("e|1|"), F.col("doc_id").cast("string")))
    )
    return dense_row_numbers(
        docs, ["_coin", "doc_id"], num_partitions=8
    ).select("doc_id", "seq")


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece model) — rows-only: the Viterbi
# DP is not SQL-expressible; the exact-integer trainer is instead
# pinned against an independent brute-force reference
# (tests/test_unigram.py) and is bit-deterministic by construction.
# ---------------------------------------------------------------------------


@q("unigram_vocab_counts")
def unigram_vocab_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained unigram-LM vocabulary over the documents corpus
    (operators/unigram.py): (piece, count) after 2 hard-EM iterations,
    exact integers end to end — the third of the big-three subword
    trainers (BPE / WordPiece / unigram). Per-iteration cost is one
    Arrow Viterbi pass over the DISTINCT-WORD relation plus a
    vocabulary-sized aggregate, never a corpus re-scan."""
    from ..operators.unigram import unigram_train

    docs = load_table(spark, sf_dir, "documents")
    return unigram_train(docs, vocab_size=120, iterations=2)


@q("unigram_token_lengths_docs")
def unigram_token_lengths_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the corpus-trained unigram
    vocabulary — the fertility audit for the unigram trainer (the
    bpe_token_lengths shape: distinct words segment once through the
    Arrow kernel; ONE corpus scan joins lengths back)."""
    from ..operators.unigram import unigram_token_lengths, unigram_train

    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_train(docs, vocab_size=120, iterations=2)
    return unigram_token_lengths(docs, vocab)
