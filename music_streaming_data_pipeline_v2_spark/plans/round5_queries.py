"""Round-5 training-data pipeline batch: BM25 keyword retrieval,
unigram-LM quality scoring, PII pattern scanning, weighted
deterministic sampling.

The retrieval/curation shapes between dedup and training that round 4
left open (operators/text.py:bm25_topk and friends), each with a
DuckDB oracle twin. Corpus tokenization mirrors the tfidf oracle's
``\\s+`` split; float accumulations are scaled-integer sums so
aggregation order can never flip a hash (see bm25_topk's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import _utc, q

#: Fixed retrieval queries over the synthetic vocabulary — literal in
#: both engines, so the oracle replays them as a VALUES list.
_BM25_QUERIES = [
    (0, "spark window join"),
    (1, "hash table scan"),
    (2, "vector stream merge batch"),
]

_BM25_K1, _BM25_B = 1.2, 0.75

# The tf→scored CTE chain is shared verbatim with the hybrid-fusion
# oracle (_ORACLE_RRF below) — ONE copy of the BM25 replay.
_BM25_CTES = rf"""tf AS (
    SELECT doc_id AS _doc, LOWER(t.tok) AS token, COUNT(*) AS tf
    FROM documents, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    GROUP BY 1, 2
),
dl AS (SELECT _doc, SUM(tf) AS dl FROM tf GROUP BY _doc),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token),
stats AS (SELECT COUNT(DISTINCT _doc) AS n_docs, SUM(tf) AS sum_dl FROM tf),
qt AS (
    SELECT DISTINCT query_id, LOWER(t.tok) AS token
    FROM (VALUES {", ".join(f"({i}, '{s}')" for i, s in _BM25_QUERIES)})
         AS q(query_id, qtext),
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(qtext), '\s+')) AS t(tok)
),
scored AS (
    SELECT qt.query_id, tf._doc,
           SUM(CAST(ROUND(
               LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(doc_freq AS DOUBLE)
                         + 0.5) / (CAST(doc_freq AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * ({_BM25_K1!r} + 1.0))
               / (CAST(tf AS DOUBLE) + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                  + {_BM25_B!r} * CAST(dl AS DOUBLE)
                  / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
               * 1e9) AS BIGINT)) AS _score_i
    FROM tf
    JOIN qt USING (token)
    JOIN dfreq USING (token)
    JOIN dl USING (_doc)
    CROSS JOIN stats
    GROUP BY 1, 2
)"""

_ORACLE_BM25 = f"""
WITH {_BM25_CTES}
SELECT query_id, rank, doc_id, score FROM (
    SELECT query_id, _doc AS doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY _score_i DESC, _doc ASC
           ) AS INTEGER) AS rank,
           CAST(_score_i AS DOUBLE) / 1e9 AS score
    FROM scored
)
WHERE rank <= 10
"""


@q("bm25_search", _ORACLE_BM25)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 keyword retrieval over the documents corpus for
    three fixed literal queries (operators/text.py:bm25_topk). The
    oracle replays the Lucene-variant idf and the per-term scaled-
    integer contributions in SQL — the cross-row sum is over BIGINTs
    on both engines, so partition-order float drift cannot flip a
    rank or a hash."""
    from ..operators.text import bm25_topk

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
    return bm25_topk(docs, queries, k=10, k1=_BM25_K1, b=_BM25_B)


from .oracle_shared import _BUCKET  # noqa: E402

_ORACLE_UNIGRAM = rf"""
WITH b AS (SELECT doc_id, text, {_BUCKET} AS bkt FROM documents),
lm AS (
    SELECT LOWER(t.tok) AS token, COUNT(*) AS c
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt < 204
    GROUP BY 1
),
stats AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM lm),
tok AS (
    SELECT doc_id AS _doc, LOWER(t.tok) AS token
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt >= 230
)
SELECT _doc AS doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CAST(ROUND(LN((CAST(COALESCE(c, 0) AS DOUBLE) + 1.0)
           / (CAST(total AS DOUBLE) + CAST(v AS DOUBLE))) * 1e9) AS BIGINT))
           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS avg_logprob
FROM tok LEFT JOIN lm USING (token) CROSS JOIN stats
GROUP BY 1
"""


@q("unigram_lm_quality", _ORACLE_UNIGRAM)
def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring over the engine's own hash
    split (operators/text.py:unigram_logprob_score): an add-one
    unigram LM trained on the train split scores the test split's
    mean token log-probability. Per-token log-probs sum as scaled
    BIGINTs, so the oracle hash cannot be flipped by aggregation
    order."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import unigram_logprob_score

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return unigram_logprob_score(docs.filter(b >= 230), docs.filter(b < 204))


# Deterministic synthetic PII injection — the testdata corpus is clean,
# so the scan query plants addresses/numbers/IPs into a DERIVED column
# with pure integer/string arithmetic both engines replay identically.
def _pii_text_sql(str_t: str) -> str:
    """One injection expression, two engines: ``str_t`` is the string
    cast target name ('STRING' for Spark, 'VARCHAR' for DuckDB)."""
    return (
        "CONCAT(text,"
        f" CASE WHEN doc_id % 7 = 0 THEN CONCAT(' contact u', CAST(doc_id AS {str_t}),"
        "   '@example.com for details') ELSE '' END,"
        " CASE WHEN doc_id % 11 = 0 THEN CONCAT(' call +1 (555) 010-',"
        f"   CAST(1000 + doc_id % 9000 AS {str_t}), ' today') ELSE '' END,"
        " CASE WHEN doc_id % 13 = 0 THEN CONCAT(' host 10.0.',"
        f"   CAST(doc_id % 256 AS {str_t}), '.1 logged') ELSE '' END)"
    )

_ORACLE_PII = f"""
WITH t AS (SELECT doc_id, {_pii_text_sql('VARCHAR')} AS text FROM documents)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT)
           AS n_email,
       CAST(LEN(REGEXP_EXTRACT_ALL(text,
            '\\+?[0-9][0-9()\\- ]{{6,}}[0-9]')) AS BIGINT) AS n_phone,
       CAST(LEN(REGEXP_EXTRACT_ALL(text,
            '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}'))
           AS BIGINT) AS n_ipv4,
       (LEN(REGEXP_EXTRACT_ALL(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
        OR LEN(REGEXP_EXTRACT_ALL(text, '\\+?[0-9][0-9()\\- ]{{6,}}[0-9]')) > 0
        OR LEN(REGEXP_EXTRACT_ALL(text,
            '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}')) > 0)
           AS has_pii
FROM t
"""


@q("pii_scan_counts", _ORACLE_PII)
def pii_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit pass (operators/text.py:pii_scan) over a corpus with
    deterministically injected addresses/numbers/IPs (the testdata is
    clean — the injection is pure integer/string arithmetic both
    engines replay). Patterns live in the RE2 ∩ Java-regex subset so
    the DuckDB oracle runs them verbatim. Map-only: counts come from
    regexp_extract_all sizes in one projection, no shuffle."""
    from ..operators.text import pii_scan

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_pii_text_sql("STRING")).alias("text")
    )
    return pii_scan(docs).select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "has_pii"
    )


_UNIFORM_SQL = (
    "("
    + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTRING(MD5('u|' || CAST(doc_id AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (11 - j)}"
        for j in range(12)
    )
    + f") / {float(16**12)!r}"
)

_ORACLE_WEIGHTED = rf"""
WITH t AS (
    SELECT doc_id, source,
           LEAST(1.0, CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text),
               '[ \t\n\r\f]+'), x -> x <> '')) AS DOUBLE) / 80.0) AS weight
    FROM documents
)
SELECT doc_id, source, ROUND(weight, 6) AS weight
FROM t WHERE {_UNIFORM_SQL} < weight
"""


@q("weighted_doc_sample", _ORACLE_WEIGHTED)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional deterministic sampling
    (operators/sampling.py:weighted_sample): keep each document with
    probability ∝ its token count (capped at 1), coin-flipped by a
    content hash — membership is exact set arithmetic both engines
    replay, no seeded rand. The oracle recomputes the 48-bit uniform
    digit-for-digit."""
    from ..operators.sampling import weighted_sample

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+"),
        lambda x: x != F.lit(""),
    )
    weighted = docs.withColumn(
        "weight", F.least(F.lit(1.0), F.size(toks).cast("double") / F.lit(80.0))
    )
    return weighted_sample(weighted, "weight", "doc_id").select(
        "doc_id", "source", F.round("weight", 6).alias("weight")
    )


from .oracle_shared import _W  # noqa: E402

_ORACLE_TEMPLATE = f"""
WITH t AS (SELECT doc_id, source, {_W} AS w FROM documents),
g AS (
    SELECT doc_id, source, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        RANGE(1, LEN(w) - 2), i -> ARRAY_TO_STRING(w[i : i + 3], ' ')))) AS gram
    FROM t WHERE LEN(w) >= 4
),
per AS (
    SELECT source AS stratum, gram, COUNT(DISTINCT doc_id) AS doc_freq
    FROM g GROUP BY 1, 2
),
tot AS (
    SELECT source AS stratum, COUNT(DISTINCT doc_id) AS n_docs
    FROM documents GROUP BY 1
)
SELECT stratum, gram, doc_freq, n_docs,
       ROUND(CAST(doc_freq AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS doc_frac
FROM per JOIN tot USING (stratum)
WHERE CAST(doc_freq AS DOUBLE) / CAST(n_docs AS DOUBLE) >= 0.05
"""


@q("boilerplate_ngrams", _ORACLE_TEMPLATE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection (operators/text.py:
    template_ngrams): word 4-grams recurring across ≥5% of one
    source's documents — the n-gram analogue of C4's duplicated-line
    stripping, run per stratum so a template leaking into one crawl
    source doesn't hide in the global average. Gram-keyed aggregate
    joined against broadcast per-stratum doc counts."""
    from ..operators.text import template_ngrams

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return template_ngrams(docs, n=4, min_doc_frac=0.05)


# --- Product quantization (operators/similarity.py:pq_*) -------------
# Seed-only codebooks (the ann_ivf_oracle trick): both engines derive
# the SAME 16 sub-codebooks from md5-ordered corpus vectors with zero
# FP aggregation, so codes and ADC distances replay exactly.

_PQ_M, _PQ_CODES, _PQ_SUB = 8, 16, 8  # 8 subspaces × 8 dims, 4-bit codes


def _pq_dot_sql(a: str, b: str, s: int) -> str:
    return " + ".join(
        f"(CAST({a}[{s * _PQ_SUB + j + 1}] AS DOUBLE)"
        f" * CAST({b}[{s * _PQ_SUB + j + 1}] AS DOUBLE))"
        for j in range(_PQ_SUB)
    )


def _pq_rank_sql(vec: str, cv: str, s: int) -> str:
    """``‖cv_sub‖² − 2·vec_sub·cv_sub`` with explicit 1-based indices —
    the Spark side's _pq_rankdist_sql twin (there ‖c‖² folds to a
    Python literal; the left-associated SQL chain over the identical
    float32-widened doubles produces the same value). Argmin-equivalent
    to the true sub-distance; the ADC table adds the query's ‖q_sub‖²
    back (see _pq_d2_sql)."""
    return (
        f"(({_pq_dot_sql(cv, cv, s)}) - (2.0 * ({_pq_dot_sql(vec, cv, s)})))"
    )


def _pq_d2_sql(vec: str, cv: str, s: int) -> str:
    """True sub-distance for the ADC table: ‖v_sub‖² + rank form, the
    exact operation order of the Spark entries (_qq{s} + rankdist)."""
    return f"(({_pq_dot_sql(vec, vec, s)}) + {_pq_rank_sql(vec, cv, s)})"


_PQ_SEEDS = f"""
seeds AS (
    SELECT embedding AS cv,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS cid
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PQ_CODES}
)"""

_PQ_DIST = (
    "dist AS (\n    SELECT e.vec_id, s.cid,\n           "
    + ",\n           ".join(
        f"{_pq_rank_sql('e.embedding', 's.cv', s)} AS d{s}"
        for s in range(_PQ_M)
    )
    + "\n    FROM embeddings e CROSS JOIN seeds s\n)"
)

_PQ_CODE_CTES = ",\n".join(
    f"""c{s} AS (
    SELECT vec_id, cid AS code FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY d{s} ASC, cid ASC) AS rn
        FROM dist
    ) WHERE rn = 1
)"""
    for s in range(_PQ_M)
)

_PQ_PACKED = " + ".join(
    f"(CAST(c{s}.code AS BIGINT) * {1 << (4 * s)})" for s in range(_PQ_M)
)

_PQ_JOINS = " ".join(f"JOIN c{s} USING (vec_id)" for s in range(_PQ_M))

_ORACLE_PQ_CODES = f"""
WITH {_PQ_SEEDS},
{_PQ_DIST},
{_PQ_CODE_CTES}
SELECT vec_id AS id, {_PQ_PACKED} AS pq_code
FROM c0 {" ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))}
"""


@q("pq_codes", _ORACLE_PQ_CODES)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al., TPAMI 2011;
    operators/similarity.py:pq_encode): each 64-dim vector becomes ONE
    packed BIGINT of 8 per-subspace nearest-sub-centroid ids — 8
    bytes/vector, the memory-resident form ANN reranking keeps for
    corpora whose full vectors don't fit. Seed-only codebooks make the
    whole encode engine-replayable: the oracle re-derives the same
    sub-codebooks from md5-ordered vectors and replays every distance
    argmin digit-for-digit. Map-only scan; argmins are flat codegen
    struct-min expressions (no CASE — the 64 KB lesson)."""
    from ..operators.similarity import pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    return pq_encode(emb, cbs)


_PQ_TABLE_UNION = "\n    UNION ALL ".join(
    f"SELECT query_id, {s} AS s, cid AS code,"
    f" CAST(ROUND(({_pq_d2_sql('qv', 'cv', s)}) * 1e9) AS BIGINT) AS d_i"
    " FROM qseeds"
    for s in range(_PQ_M)
)

_PQ_PROBE_UNION = "\n    UNION ALL ".join(
    f"SELECT id AS doc_id, {s} AS s,"
    f" CAST((pq_code // {1 << (4 * s)}) % 16 AS INT) AS code FROM codes"
    for s in range(_PQ_M)
)

_ORACLE_PQ_TOPK = f"""
WITH {_PQ_SEEDS},
{_PQ_DIST},
{_PQ_CODE_CTES},
codes AS (
    SELECT vec_id AS id, {_PQ_PACKED} AS pq_code
    FROM c0 {" ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))}
),
qseeds AS (
    SELECT q.vec_id AS query_id, q.embedding AS qv, s.cv, s.cid
    FROM embeddings q CROSS JOIN seeds s
    WHERE q.vec_id < 5
),
dtable AS (
    {_PQ_TABLE_UNION}
),
probes AS (
    {_PQ_PROBE_UNION}
),
scored AS (
    SELECT t.query_id, p.doc_id, SUM(t.d_i) AS d
    FROM probes p JOIN dtable t USING (s, code)
    GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, adist FROM (
    SELECT query_id, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank,
           CAST(d AS DOUBLE) / 1e9 AS adist
    FROM scored
)
WHERE rank <= 10
"""


@q("pq_topk_adc", _ORACLE_PQ_TOPK)
def pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 (operators/similarity.py:
    pq_topk): per-query distance tables to every sub-centroid are
    broadcast; the corpus side moves only 8-byte codes. Distance
    entries round to scaled BIGINTs so the cross-subspace sum is
    aggregation-order-free, and the oracle replays the codebook
    derivation, encoding, table build, and ranking end-to-end."""
    from ..operators.similarity import pq_codebooks, pq_encode, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    # the codes ARE the PQ index — production computes them once at
    # ingest (ivf_topk's materialization argument); checkpointing also
    # keeps the 1024-term encode expression out of every downstream
    # stage's optimizer/codegen walk
    codes = pq_encode(emb, cbs).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(codes, queries, cbs, k=10)


def _l2_d2_sql(q: str, v: str) -> str:
    return " + ".join(
        f"POWER(CAST({q}[{i + 1}] AS DOUBLE) - CAST({v}[{i + 1}] AS DOUBLE), 2)"
        for i in range(_PQ_M * _PQ_SUB)
    )


_ORACLE_PQ_RECALL = f"""
WITH {_PQ_SEEDS},
{_PQ_DIST},
{_PQ_CODE_CTES},
codes AS (
    SELECT vec_id AS id, {_PQ_PACKED} AS pq_code
    FROM c0 {" ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))}
),
qseeds AS (
    SELECT q.vec_id AS query_id, q.embedding AS qv, s.cv, s.cid
    FROM embeddings q CROSS JOIN seeds s
    WHERE q.vec_id < 5
),
dtable AS (
    {_PQ_TABLE_UNION}
),
probes AS (
    {_PQ_PROBE_UNION}
),
adc AS (
    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT t.query_id, p.doc_id, SUM(t.d_i) AS d
        FROM probes p JOIN dtable t USING (s, code)
        GROUP BY 1, 2
    )
),
exact AS (
    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               CAST(ROUND(({_l2_d2_sql('q.embedding', 'e.embedding')}) * 1e9)
                    AS BIGINT) AS d
        FROM embeddings e
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id < 5) q
    )
)
SELECT (SELECT COUNT(DISTINCT query_id) FROM exact WHERE rank <= 10)
           AS n_queries,
       10 AS k,
       (SELECT COUNT(*) FROM exact WHERE rank <= 10) AS n_exact,
       (SELECT COUNT(*) FROM exact e
        JOIN adc a ON e.query_id = a.query_id AND e.doc_id = a.doc_id
        WHERE e.rank <= 10 AND a.rank <= 10) AS n_hits
"""


@q("pq_recall", _ORACLE_PQ_RECALL)
def pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PQ/ADC against exact brute-force L2 as a one-row
    in-engine reduction — the ann_lsh_recall pattern for the quantized
    index: the oracle replays BOTH sides (codebooks, codes, ADC
    ranking, exact L2 ranking), so the recall number is deterministic
    and driver-hashed, not a pinned threshold."""
    from ..operators.similarity import (
        l2_topk,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    codes = pq_encode(emb, cbs).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(codes, queries, cbs, k=10)
    exact = l2_topk(emb, queries, k=10, dims=_PQ_M * _PQ_SUB)
    hits = exact.join(
        approx.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            "n_queries", F.lit(10).alias("k"), "n_exact", "n_hits"
        )
    )


# --- IVFADC: coarse IVF pruning + PQ asymmetric-distance ranking ----
# The IVF codebook is the first 8 of the SAME md5-ordered seed set the
# PQ sub-codebooks come from, so the whole two-level index derives
# from one engine-portable ordering with zero FP aggregation.
_IVFPQ_NPROBE, _IVFPQ_NCELLS = 3, 8

_ORACLE_IVFPQ = f"""
WITH {_PQ_SEEDS},
ivf_seeds AS (SELECT cv, cid FROM seeds WHERE cid < {_IVFPQ_NCELLS}),
{_PQ_DIST},
{_PQ_CODE_CTES},
codes AS (
    SELECT vec_id AS id, {_PQ_PACKED} AS pq_code
    FROM c0 {" ".join(f"JOIN c{s} USING (vec_id)" for s in range(1, _PQ_M))}
),
cells AS (
    SELECT vec_id AS id, cid AS centroid_id FROM (
        SELECT e.vec_id, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {{COS}} DESC, s.cid ASC) AS rn
        FROM embeddings e CROSS JOIN ivf_seeds s
    ) WHERE rn = 1
),
qprobes AS (
    SELECT query_id, cid AS centroid_id FROM (
        SELECT qp.vec_id AS query_id, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY qp.vec_id
                   ORDER BY {{QCOS}} DESC, s.cid ASC) AS prn
        FROM embeddings qp CROSS JOIN ivf_seeds s
        WHERE qp.vec_id < 5
    ) WHERE prn <= {_IVFPQ_NPROBE}
),
cand AS (
    SELECT q.query_id, c.id AS doc_id
    FROM cells c JOIN qprobes q USING (centroid_id)
),
qseeds AS (
    SELECT q.vec_id AS query_id, q.embedding AS qv, s.cv, s.cid
    FROM embeddings q CROSS JOIN seeds s
    WHERE q.vec_id < 5
),
dtable AS (
    {_PQ_TABLE_UNION}
),
probes AS (
    {_PQ_PROBE_UNION}
),
scored AS (
    SELECT t.query_id, p.doc_id, SUM(t.d_i) AS d
    FROM cand
    JOIN probes p USING (doc_id)
    JOIN dtable t ON t.query_id = cand.query_id
                 AND t.s = p.s AND t.code = p.code
    GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, adist FROM (
    SELECT query_id, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank,
           CAST(d AS DOUBLE) / 1e9 AS adist
    FROM scored
)
WHERE rank <= 10
"""


def _ivfpq_oracle() -> str:
    from .driver_queries import cos_sql

    return _ORACLE_IVFPQ.replace(
        "{COS}", cos_sql("e.embedding", "s.cv")
    ).replace("{QCOS}", cos_sql("qp.embedding", "s.cv"))


@q("ivfpq_topk_adc", _ivfpq_oracle())
def ivfpq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (operators/similarity.py:ivfpq_topk — FAISS's
    IndexIVFPQ architecture): the md5-seed IVF codebook prunes to 3 of
    8 cells per query, PQ asymmetric distance ranks the cells' members
    from 8-byte codes. Both codebooks derive from one md5-ordered seed
    set, so the oracle replays cell assignment, probing, encoding, and
    ADC ranking end-to-end."""
    from ..operators.similarity import (
        ivfpq_topk,
        pq_codebooks,
        seed_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(emb, m=_PQ_M, n_codes=_PQ_CODES)
    cents = seed_vectors(emb, _IVFPQ_NCELLS)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_topk(
        emb, queries, cents, cbs, k=10, nprobe=_IVFPQ_NPROBE
    )


_DUP_L = 5

_ORACLE_DUP_SPANS = f"""
WITH t AS (SELECT doc_id, {_W} AS w FROM documents),
g AS (
    SELECT doc_id, i - 1 AS pos,
           ARRAY_TO_STRING(w[i : i + {_DUP_L - 1}], ' ') AS gram
    FROM (SELECT doc_id, w, UNNEST(RANGE(1, LEN(w) - {_DUP_L - 2})) AS i
          FROM t WHERE LEN(w) >= {_DUP_L})
),
dup AS (
    SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
seeds AS (
    SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)
),
grouped AS (
    SELECT doc_id, pos,
           SUM(CASE WHEN pos > prev + {_DUP_L - 1} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM (SELECT doc_id, pos,
                 LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM seeds)
)
SELECT doc_id,
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {_DUP_L - 1} AS INT) AS span_end,
       CAST(MAX(pos) + {_DUP_L - 1} - MIN(pos) + 1 AS INT) AS n_span_tokens
FROM grouped
GROUP BY doc_id, grp
"""


@q("duplicated_spans", _ORACLE_DUP_SPANS)
def duplicated_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document duplicated-substring spans (Lee et al.,
    ACL 2022 removal semantics; operators/text.py:duplicated_spans):
    maximal token ranges whose every 5-gram window also occurs in
    another document — the spans the paper's suffix-array pass cuts
    out of C4. Gram-keyed and doc-keyed shuffles only, never
    doc×doc."""
    from ..operators.text import duplicated_spans

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = duplicated_spans(docs, min_tokens=_DUP_L)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("n_span_tokens").cast("int").alias("n_span_tokens"),
    )


#: DSIR target domain: three of the twenty synthetic sources stand in
#: for the "high-quality" corpus; the rest are the raw pool.
_DSIR_TARGET = ("src0", "src1", "src2")
_DSIR_TGT_IN = ", ".join(f"'{s}'" for s in _DSIR_TARGET)

#: md5 hex-digit bucket of a gram under the 'd|' feature salt — the
#: DuckDB twin of hash_bucket(gram, 256, salt='d|').
_DSIR_BKT = (
    "((INSTR('0123456789abcdef', SUBSTRING(MD5('d|' || gram), 1, 1)) - 1) * 16"
    " + (INSTR('0123456789abcdef', SUBSTRING(MD5('d|' || gram), 2, 1)) - 1))"
)

#: Shared oracle prefix: occurrence-level hashed unigram+bigram
#: features, both bucket distributions, the scaled log-ratio table,
#: and the per-doc integer-sum scores for the raw pool.
_DSIR_CTES = rf"""
WITH w AS (
    SELECT doc_id, source,
           LIST_TRANSFORM({_W}, t -> LOWER(t)) AS toks
    FROM documents
),
f AS (
    SELECT doc_id, source,
           UNNEST(LIST_CONCAT(
               toks,
               LIST_TRANSFORM(RANGE(1, LEN(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])
           )) AS gram
    FROM w
),
b AS (SELECT doc_id, source, {_DSIR_BKT} AS bkt FROM f),
tc AS (
    SELECT bkt, COUNT(*) AS tc FROM b
    WHERE source IN ({_DSIR_TGT_IN}) GROUP BY 1
),
rc AS (
    SELECT bkt, COUNT(*) AS rc FROM b
    WHERE source NOT IN ({_DSIR_TGT_IN}) GROUP BY 1
),
tt AS (SELECT CAST(SUM(tc) AS BIGINT) AS ttot FROM tc),
rt AS (SELECT CAST(SUM(rc) AS BIGINT) AS rtot FROM rc),
lr AS (
    SELECT rc.bkt,
           CAST(ROUND(LN(
               ((CAST(COALESCE(tc.tc, 0) AS DOUBLE) + 1.0)
                / (CAST(ttot AS DOUBLE) + 256.0))
               / ((CAST(rc.rc AS DOUBLE) + 1.0)
                  / (CAST(rtot AS DOUBLE) + 256.0))
           ) * 1e9) AS BIGINT) AS lr_i
    FROM rc LEFT JOIN tc ON rc.bkt = tc.bkt CROSS JOIN tt CROSS JOIN rt
),
s AS (
    SELECT b.doc_id, COUNT(*) AS n_feats,
           CAST(SUM(lr_i) AS BIGINT) AS sum_i
    FROM b JOIN lr USING (bkt)
    WHERE source NOT IN ({_DSIR_TGT_IN})
    GROUP BY 1
)
"""

_ORACLE_DSIR_WEIGHTS = (
    _DSIR_CTES
    + """
SELECT doc_id, n_feats, CAST(sum_i AS DOUBLE) / 1e9 AS log_weight FROM s
"""
)

_DSIR_UNIFORM = (
    "("
    + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTRING(MD5('g|' || CAST(doc_id AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (11 - j)}"
        for j in range(12)
    )
    + f") / {float(16**12)!r}"
)

_DSIR_K = 50

_ORACLE_DSIR_TOPK = (
    _DSIR_CTES
    + f"""
, g AS (
    SELECT doc_id,
           sum_i + CAST(ROUND(-LN(-LN(GREATEST({_DSIR_UNIFORM}, 1e-12)))
                         * 1e9) AS BIGINT) AS score_i
    FROM s
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_i DESC, doc_id ASC) AS INTEGER)
           AS rank,
       doc_id,
       CAST(score_i AS DOUBLE) / 1e9 AS score
FROM g ORDER BY score_i DESC, doc_id ASC LIMIT {_DSIR_K}
"""
)


def _dsir_split(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_DSIR_TARGET))
    raw = docs.filter(~F.col("source").isin(*_DSIR_TARGET))
    return raw, target


@q("dsir_importance_weights", _ORACLE_DSIR_WEIGHTS)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023;
    operators/sampling.py:dsir_importance): hashed unigram+bigram
    log-likelihood ratio of each raw-pool document against the target
    domain (three synthetic sources). The oracle replays the md5
    bucket hash digit-for-digit and the smoothed log-ratio as a
    scaled-BIGINT sum, so partition order can never flip the hash."""
    _utc(spark)
    from ..operators.sampling import dsir_importance

    raw, target = _dsir_split(spark, sf_dir)
    return dsir_importance(raw, target)


@q("dsir_gumbel_topk", _ORACLE_DSIR_TOPK)
def dsir_gumbel_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k DSIR resampling (sampling k docs without
    replacement ∝ importance weight, derandomized by the 'g|'
    content-hash uniform; operators/sampling.py:dsir_gumbel_topk).
    Sort key is the integer sum of two scaled-9dp BIGINTs — exact on
    both engines; TakeOrderedAndProject, no global sort."""
    _utc(spark)
    from ..operators.sampling import dsir_gumbel_topk, dsir_importance

    raw, target = _dsir_split(spark, sf_dir)
    return dsir_gumbel_topk(dsir_importance(raw, target), k=_DSIR_K)


_TEMP_ALPHA, _TEMP_BUDGET = 0.3, 0.5

_TEMP_UNIFORM = (
    "("
    + " + ".join(
        f"(INSTR('0123456789abcdef', SUBSTRING(MD5('t|' || CAST(doc_id AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (11 - j)}"
        for j in range(12)
    )
    + f") / {float(16**12)!r}"
)

_ORACLE_TEMPERATURE = f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
p AS (
    SELECT lang, n,
           CAST(ROUND(POWER(CAST(n AS DOUBLE) / CAST(total AS DOUBLE),
                            {_TEMP_ALPHA!r}) * 1e9) AS BIGINT) AS pow_i
    FROM c CROSS JOIN t
),
s AS (SELECT CAST(SUM(pow_i) AS BIGINT) AS sum_i FROM p),
r AS (
    SELECT lang,
           ROUND(LEAST(1.0, {_TEMP_BUDGET!r} * CAST(total AS DOUBLE)
               * (CAST(pow_i AS DOUBLE) / CAST(sum_i AS DOUBLE))
               / CAST(n AS DOUBLE)), 6) AS rate
    FROM p CROSS JOIN t CROSS JOIN s
)
SELECT d.doc_id, d.lang, r.rate
FROM documents d JOIN r USING (lang)
WHERE {_TEMP_UNIFORM} < r.rate
"""


@q("temperature_lang_sample", _ORACLE_TEMPERATURE)
def temperature_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α-temperature language rebalancing (Conneau & Lample 2019 /
    XLM-R; operators/sampling.py:temperature_sample): sample the
    corpus to ~half size with language shares flattened by p^0.3 —
    low-resource languages up-weighted, the head kept. The oracle
    replays the scaled-BIGINT Σp^α, the 6-dp rate, and the 't|'
    content-hash coin digit-for-digit."""
    _utc(spark)
    from ..operators.sampling import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(
        docs, "lang", "doc_id", alpha=_TEMP_ALPHA, budget_frac=_TEMP_BUDGET
    ).select("doc_id", "lang", "rate")


_HN_K, _HN_N, _HN_MAXJ = 20, 5, 0.5

#: Full replay: BM25 scoring (same literals as _ORACLE_BM25), top-k
#: ranking, candidate-only distinct 5-gram sets, exact integer-set
#: Jaccard against the rank-1 positive, near-dup exclusion.
_ORACLE_HARD_NEG = rf"""
WITH tf AS (
    SELECT doc_id AS _doc, LOWER(t.tok) AS token, COUNT(*) AS tf
    FROM documents, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    GROUP BY 1, 2
),
dl AS (SELECT _doc, SUM(tf) AS dl FROM tf GROUP BY _doc),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token),
stats AS (SELECT COUNT(DISTINCT _doc) AS n_docs, SUM(tf) AS sum_dl FROM tf),
qt AS (
    SELECT DISTINCT query_id, LOWER(t.tok) AS token
    FROM (VALUES {", ".join(f"({i}, '{s}')" for i, s in _BM25_QUERIES)})
         AS q(query_id, qtext),
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(qtext), '\s+')) AS t(tok)
),
scored AS (
    SELECT qt.query_id, tf._doc,
           SUM(CAST(ROUND(
               LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(doc_freq AS DOUBLE)
                         + 0.5) / (CAST(doc_freq AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * ({_BM25_K1!r} + 1.0))
               / (CAST(tf AS DOUBLE) + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                  + {_BM25_B!r} * CAST(dl AS DOUBLE)
                  / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
               * 1e9) AS BIGINT)) AS _score_i
    FROM tf
    JOIN qt USING (token)
    JOIN dfreq USING (token)
    JOIN dl USING (_doc)
    CROSS JOIN stats
    GROUP BY 1, 2
),
top AS (
    SELECT query_id, doc_id, bm25_rank, score FROM (
        SELECT query_id, _doc AS doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY _score_i DESC, _doc ASC
               ) AS INTEGER) AS bm25_rank,
               CAST(_score_i AS DOUBLE) / 1e9 AS score
        FROM scored
    ) WHERE bm25_rank <= {_HN_K}
),
pos AS (SELECT query_id, doc_id AS pos_doc FROM top WHERE bm25_rank = 1),
grams AS (
    SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        RANGE(1, LEN(w) - {_HN_N - 2}),
        i -> ARRAY_TO_STRING(w[i : i + {_HN_N - 1}], ' ')
    ))) AS gram
    FROM (
        SELECT doc_id, {{W}} AS w FROM documents
        WHERE doc_id IN (SELECT doc_id FROM top)
    ) WHERE LEN(w) >= {_HN_N}
),
sz AS (SELECT doc_id, COUNT(*) AS s FROM grams GROUP BY 1),
pos_g AS (
    SELECT p.query_id, g.gram FROM pos p JOIN grams g ON g.doc_id = p.pos_doc
),
inter AS (
    SELECT c.query_id, c.doc_id, COUNT(*) AS i
    FROM top c
    JOIN grams g ON g.doc_id = c.doc_id
    JOIN pos_g pg ON pg.query_id = c.query_id AND pg.gram = g.gram
    WHERE c.bm25_rank >= 2
    GROUP BY 1, 2
),
neg AS (
    SELECT c.query_id, c.doc_id, c.bm25_rank, c.score,
           COALESCE(i.i, 0) AS ii,
           COALESCE(ps.s, 0) + COALESCE(cs.s, 0) - COALESCE(i.i, 0) AS u
    FROM top c
    JOIN pos p USING (query_id)
    LEFT JOIN sz ps ON ps.doc_id = p.pos_doc
    LEFT JOIN sz cs ON cs.doc_id = c.doc_id
    LEFT JOIN inter i ON i.query_id = c.query_id AND i.doc_id = c.doc_id
    WHERE c.bm25_rank >= 2
)
SELECT query_id, doc_id, bm25_rank, score,
       CASE WHEN u = 0 THEN 0.0
            ELSE ROUND(CAST(ii AS DOUBLE) / CAST(u AS DOUBLE), 6)
       END AS jaccard_with_pos
FROM neg
WHERE CASE WHEN u = 0 THEN 0.0
           ELSE ROUND(CAST(ii AS DOUBLE) / CAST(u AS DOUBLE), 6)
      END <= {_HN_MAXJ!r}
""".replace("{W}", _W)


@q("bm25_hard_negatives", _ORACLE_HARD_NEG)
def bm25_hard_negatives_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 hard-negative mining (Karpukhin et al., EMNLP 2020;
    operators/text.py:bm25_hard_negatives): per fixed query, the
    below-top candidates minus near-duplicates of the rank-1 positive
    (distinct 5-gram Jaccard > 0.5). Everything past retrieval is
    candidate-bounded; the oracle replays BM25 AND the integer-set
    Jaccard end-to-end."""
    from ..operators.text import bm25_hard_negatives

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
    return bm25_hard_negatives(
        docs, qdf, k=_HN_K, n=_HN_N, max_jaccard=_HN_MAXJ
    )


_LD_W = 10  # tokens per synthetic line

_ORACLE_LINE_DEDUP = f"""
WITH w AS (
    SELECT doc_id, {_W} AS t FROM documents
),
l AS (
    SELECT doc_id, CAST(i AS INTEGER) - 1 AS pos,
           ARRAY_TO_STRING(t[(i - 1) * {_LD_W} + 1 : (i - 1) * {_LD_W} + {_LD_W}], ' ') AS line
    FROM w, UNNEST(RANGE(1, CAST(CEIL(LEN(t) / {float(_LD_W)!r}) AS BIGINT) + 1)) AS r(i)
),
ne AS (SELECT doc_id, pos, line FROM l WHERE TRIM(line) <> ''),
kept AS (
    SELECT doc_id, pos, line FROM (
        SELECT doc_id, pos, line,
               ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        FROM ne
    ) WHERE rn = 1
),
stats AS (SELECT doc_id, COUNT(*) AS n_lines FROM ne GROUP BY 1),
rebuilt AS (
    SELECT doc_id, STRING_AGG(line, CHR(10) ORDER BY pos) AS text,
           COUNT(*) AS n_kept
    FROM kept GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(r.text, '') AS text,
       COALESCE(s.n_lines, 0) AS n_lines,
       COALESCE(s.n_lines, 0) - COALESCE(r.n_kept, 0) AS n_dropped
FROM documents d
LEFT JOIN stats s ON s.doc_id = d.doc_id
LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
"""


@q("line_dedup_docs", _ORACLE_LINE_DEDUP)
def line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact line dedup with reassembly (C4 / RefinedWeb
    repeated-line removal; operators/dedup.py:dedup_lines). The flat
    testdata text is line-ified deterministically into 10-token
    chunks on BOTH engines first (the pii_scan_counts injection
    pattern — the corpus has no newlines of its own); the oracle then
    replays first-occurrence selection and the newline reassembly
    verbatim, value-comparing the rebuilt text itself."""
    from ..operators.dedup import dedup_lines
    from ..operators.packing import lineify_tokens

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    lineified = lineify_tokens("text", _LD_W)
    return dedup_lines(
        docs.select("doc_id", lineified.alias("text")), "text", "doc_id"
    )


# ---------------------------------------------------------------------------
# Cluster-level curation: leakage-safe splits and representative
# selection. Both compose the near-dup connected components the engine
# already proves (dedup_clusters) with the content-hash split /
# quality machinery — the step a real curation pipeline runs BETWEEN
# dedup and training: never let two near-duplicates straddle
# train/test, and keep the best copy of each duplicate cluster rather
# than an arbitrary one.
# ---------------------------------------------------------------------------

from .oracle_shared import _CC_CTES, _md5_bucket_sql  # noqa: E402

_ORACLE_LEAKAGE_SPLIT = f"""{_CC_CTES},
b AS (
    SELECT doc_id, component, {_md5_bucket_sql('component')} AS bkt
    FROM alldocs
)
SELECT doc_id, component,
       CASE WHEN bkt < 204 THEN 'train'
            WHEN bkt < 230 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@q("leakage_safe_split", _ORACLE_LEAKAGE_SPLIT)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe dataset split at CLUSTER granularity: the
    split coin is hashed on the near-dup component id, not the doc id,
    so two near-duplicate documents can never land in different splits
    (doc-keyed splits leak test content into train through surviving
    near-dups — the GPT-3 contamination failure mode, which
    ngram_decontamination then has to patch after the fact; splitting
    by component prevents it structurally). Components come from the
    same cost-based clustering dedup_clusters proves; the split is the
    engine's canonical md5 identity coin (operators/sampling.py:
    dataset_split), a pure function of component id. Scale: the only
    cost beyond clustering itself is one map-side hash — no new
    shuffle; the oracle replays closure + coin exactly."""
    from ..operators.clustering import dedup_clusters_auto
    from ..operators.sampling import dataset_split

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup_clusters_auto(docs, "lang", "text", "doc_id", 0.8).select(
        "doc_id", "component"
    )
    return dataset_split(cc, "component")


_ORACLE_CLUSTER_REPS = rf"""{_CC_CTES},
qual AS (
    SELECT d.doc_id, a.component, d.n_chars,
           CAST(LEN(LIST_DISTINCT(
                REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(d.text)), '\s+'))) AS DOUBLE)
             / LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(d.text)), '\s+'))
             AS uniq_ratio
    FROM documents d JOIN alldocs a ON a.doc_id = d.doc_id
)
SELECT component, rep_doc_id, cluster_size, cluster_size - 1 AS n_dropped
FROM (
    SELECT component, doc_id AS rep_doc_id,
           COUNT(*) OVER (PARTITION BY component) AS cluster_size,
           ROW_NUMBER() OVER (
               PARTITION BY component
               ORDER BY uniq_ratio DESC, n_chars DESC, doc_id ASC
           ) AS rn
    FROM qual
) WHERE rn = 1
"""


@q("cluster_representatives", _ORACLE_CLUSTER_REPS)
def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax representative per near-dup cluster: instead of
    dedup_clusters' keep-the-min-id rule, keep the best copy — ordered
    by distinct-token ratio (boilerplate-heavy copies score low), then
    n_chars, then doc_id as the deterministic tiebreak (the same total
    order in both engines; the ratio is a single IEEE division of two
    small ints, bit-identical cross-engine). One doc-keyed join to
    attach quality and one component-keyed window — the same shuffle
    key profile the clustering output already has, no new skew
    surface. The oracle replays closure, quality, and the argmax
    verbatim."""
    from ..operators.clustering import (
        cluster_representatives as _reps,
    )
    from ..operators.clustering import dedup_clusters_auto

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup_clusters_auto(docs, "lang", "text", "doc_id", 0.8)
    return _reps(docs, cc)


# ---------------------------------------------------------------------------
# Interpolated bigram LM quality — the word-ORDER-sensitive step up
# from unigram_lm_quality toward CCNet's KenLM scoring.
# ---------------------------------------------------------------------------

_BG_LAM = 0.7

_ORACLE_BIGRAM = rf"""
WITH b AS (SELECT doc_id, text, {_BUCKET} AS bkt FROM documents),
tk AS (
    SELECT doc_id, bkt,
           LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
                          t -> LOWER(t)) AS w
    FROM b
),
bg AS (
    SELECT doc_id, bkt, w[i] AS prev, w[i + 1] AS cur
    FROM tk, UNNEST(RANGE(1, LEN(w))) AS r(i)
    WHERE LEN(w) >= 2
),
lmb AS (SELECT prev, cur, COUNT(*) AS cb FROM bg WHERE bkt < 204 GROUP BY 1, 2),
ctx AS (SELECT prev, SUM(cb) AS cc FROM lmb GROUP BY 1),
uni AS (
    SELECT LOWER(t.tok) AS cur, COUNT(*) AS c
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt < 204
    GROUP BY 1
),
stats AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM uni),
sc AS (SELECT doc_id, prev, cur FROM bg WHERE bkt >= 230)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(ROUND(LN({_BG_LAM!r} * (CASE WHEN cc IS NULL THEN 0.0
           ELSE CAST(COALESCE(cb, 0) AS DOUBLE) / CAST(cc AS DOUBLE) END)
           + {1.0 - _BG_LAM!r} * (CAST(COALESCE(c, 0) AS DOUBLE) + 1.0)
           / (CAST(total AS DOUBLE) + CAST(v AS DOUBLE))) * 1e9) AS BIGINT))
           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS avg_logprob
FROM sc
LEFT JOIN lmb USING (prev, cur)
LEFT JOIN ctx USING (prev)
LEFT JOIN uni USING (cur)
CROSS JOIN stats
GROUP BY 1
"""


@q("bigram_lm_quality", _ORACLE_BIGRAM)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer bigram LM quality over the engine's own hash
    split (operators/text.py:bigram_logprob_score): transition
    probabilities trained on the train split score the test split —
    word order now matters, unlike unigram_lm_quality. Per-transition
    log-probs sum as scaled BIGINTs; the interpolation expression is
    evaluated in one fixed operation order so both engines produce
    the identical double before rounding."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import bigram_logprob_score

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return bigram_logprob_score(
        docs.filter(b >= 230), docs.filter(b < 204), lam=_BG_LAM
    )


# ---------------------------------------------------------------------------
# Retrieval composition: hybrid RRF fusion, ranking-quality metrics,
# MMR diversification (operators/retrieval.py) — plus NFD bin packing
# and PSI drift auditing. The late round-5 batch.
# ---------------------------------------------------------------------------

_RRF_C, _RRF_DEPTH, _RRF_K = 60, 20, 10


def _oracle_rrf() -> str:
    """Hybrid-fusion replay: the shared BM25 CTE chain ranked to depth
    20, the dense cosine ranking for query vectors 0-2 ranked to depth
    20, per-source 1/(c+rank) contributions as scaled BIGINTs, fused
    and re-ranked."""
    from .driver_queries import cos_sql

    contrib = (
        f"CAST(ROUND(1e9 / ({_RRF_C} + CAST(rank AS DOUBLE))) AS BIGINT)"
    )
    return f"""
WITH {_BM25_CTES},
bmr AS (
    SELECT query_id, _doc AS doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY _score_i DESC, _doc ASC
           ) AS rank
    FROM scored
),
qv AS (
    SELECT CAST(vec_id AS INTEGER) AS query_id, embedding AS v
    FROM embeddings WHERE vec_id < 3
),
dsc AS (
    SELECT q.query_id, e.vec_id AS doc_id,
           {cos_sql('q.v', 'e.embedding')} AS cos
    FROM embeddings e CROSS JOIN qv q
),
dnr AS (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, doc_id ASC
           ) AS rank
    FROM dsc
),
u AS (
    SELECT query_id, doc_id, {contrib} AS c FROM bmr WHERE rank <= {_RRF_DEPTH}
    UNION ALL
    SELECT query_id, doc_id, {contrib} FROM dnr WHERE rank <= {_RRF_DEPTH}
),
fused AS (
    SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS ci,
           CAST(COUNT(*) AS INTEGER) AS n_sources
    FROM u GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, rrf_score, n_sources FROM (
    SELECT query_id, doc_id, n_sources,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ci DESC, doc_id ASC
           ) AS INTEGER) AS rank,
           CAST(ci AS DOUBLE) / 1e9 AS rrf_score
    FROM fused
)
WHERE rank <= {_RRF_K}
"""


@q("rrf_hybrid_topk", _oracle_rrf())
def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 (lexical) and exact-cosine (dense) rankings
    for the same three queries fused by reciprocal-rank fusion
    (operators/retrieval.py:rrf_fuse) — the standard two-retriever
    combiner, needing no score calibration because only ranks enter.
    Query texts pair with query vectors 0-2 (doc_id ↔ vec_id is 1:1 in
    the testdata). Per-source 1/(60+rank) contributions sum as scaled
    BIGINTs, so the fused ordering is partition- and engine-
    independent."""
    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import cosine_topk
    from ..operators.text import bm25_topk

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(_BM25_QUERIES, "query_id int, text string")
    bm = bm25_topk(docs, queries, k=_RRF_DEPTH, k1=_BM25_K1, b=_BM25_B)
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    dn = cosine_topk(emb, qv, k=_RRF_DEPTH, dims=64).select(
        "query_id", "rank", F.col("neighbor_id").alias("doc_id")
    )
    return rrf_fuse(
        {"bm25": bm.select("query_id", "rank", "doc_id"), "dense": dn},
        k=_RRF_K,
        c=_RRF_C,
    )


def _oracle_retrieval_metrics() -> str:
    """MRR/nDCG replay: self-excluded dense top-10 per query vector
    0-9, relevance = shared label, DCG/IDCG as scaled-BIGINT sums."""
    from .driver_queries import cos_sql

    dcg_term = (
        "CASE WHEN rel = 1 THEN CAST(ROUND(1e9 / LOG2(CAST(rank AS DOUBLE)"
        " + 1.0)) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    idcg = (
        "CASE WHEN n_relevant <= 0 THEN CAST(0 AS BIGINT) ELSE "
        "LIST_SUM(LIST_TRANSFORM(RANGE(1, LEAST(CAST(n_relevant AS INTEGER), 10) + 1), "
        "i -> CAST(ROUND(1e9 / LOG2(CAST(i AS DOUBLE) + 1.0)) AS BIGINT))) END"
    )
    return f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS qlab
    FROM embeddings WHERE vec_id < 10
),
cls AS (SELECT label, COUNT(*) AS cn FROM embeddings GROUP BY 1),
nr AS (
    SELECT q.query_id, CAST(cls.cn - 1 AS BIGINT) AS n_relevant, q.qlab
    FROM q JOIN cls ON cls.label = q.qlab
),
sc AS (
    SELECT q.query_id, e.vec_id AS nbr, e.label AS nlab,
           {cos_sql('q.qv', 'e.embedding')} AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
),
r AS (
    SELECT query_id, nbr, nlab,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos DESC, nbr ASC
           ) AS rank
    FROM sc
),
h AS (
    SELECT r.query_id, r.rank,
           CASE WHEN r.nlab = nr.qlab THEN 1 ELSE 0 END AS rel
    FROM r JOIN nr USING (query_id)
    WHERE r.rank <= 10
),
a AS (
    SELECT query_id,
           MIN(CASE WHEN rel = 1 THEN rank END) AS frr,
           CAST(SUM({dcg_term}) AS BIGINT) AS dcg_i
    FROM h GROUP BY 1
)
SELECT nr.query_id, nr.n_relevant,
       CAST(frr AS INTEGER) AS first_rel_rank,
       CASE WHEN frr IS NULL THEN 0.0
            ELSE 1.0 / CAST(frr AS DOUBLE) END AS mrr,
       CASE WHEN CAST({idcg} AS BIGINT) > 0
            THEN CAST(dcg_i AS DOUBLE) / CAST(CAST({idcg} AS BIGINT) AS DOUBLE)
       END AS ndcg
FROM nr JOIN a USING (query_id)
"""


@q("retrieval_mrr_ndcg", _oracle_retrieval_metrics())
def retrieval_mrr_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation (operators/retrieval.py:
    retrieval_metrics): exact-cosine top-10 per query vector 0-9
    (query excluded from its own candidates), a neighbor is relevant
    iff it carries the query's label, per-query MRR and binary nDCG@10.
    DCG terms and the ideal-DCG prefix both accumulate as scaled
    BIGINTs, so nDCG is one division of two exact integers."""
    from pyspark.sql import Window

    from ..operators.retrieval import retrieval_metrics
    from ..operators.similarity import cosine

    _utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    scored = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .join(F.broadcast(qv), how="cross")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_cos", cosine(F.col("_qv"), F.col("embedding")))
        .filter(F.col("_cos").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    ranking = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id")
    )
    return retrieval_metrics(
        ranking, emb.select("vec_id", "label"), k=10
    ).orderBy("query_id")


_MMR_LAM, _MMR_KC, _MMR_KS = 0.7, 15, 5


def _oracle_mmr() -> str:
    """Greedy MMR replay: the selection loop unrolled into one plain
    CTE per step (no recursion — window argmax per step). Similarities
    pin to 6-dp INTEGERS once; every derived score is exact
    ``λ_i·simq_i − (1e6−λ_i)·maxsim_i`` BIGINT arithmetic, mirroring
    operators/retrieval.py:_cos6i — rounding a λ-combination of 6-dp
    doubles instead lands EXACTLY on the 7th-decimal boundary for
    ~10% of inputs, where engine rounding conventions diverge (caught
    by the test_mmr_matches_python_greedy fuzz)."""
    from .driver_queries import cos_sql

    lam_i = int(round(_MMR_LAM * 1e6))
    one_m_i = 1_000_000 - lam_i
    parts = [
        f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 3
),
sc AS (
    SELECT q.query_id, e.vec_id AS cid,
           CAST(ROUND({cos_sql('q.qv', 'e.embedding')} * 1e6) AS BIGINT)
               AS simq
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
),
cand AS (
    SELECT query_id, cid, simq FROM (
        SELECT query_id, cid, simq,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY simq DESC, cid ASC
               ) AS rn
        FROM sc
    ) WHERE rn <= {_MMR_KC}
),
cv AS (
    SELECT c.query_id, c.cid, e.embedding AS v
    FROM cand c JOIN embeddings e ON e.vec_id = c.cid
),
pair AS (
    SELECT a.query_id, a.cid AS pa, b.cid AS pb,
           CAST(ROUND({cos_sql('a.v', 'b.v')} * 1e6) AS BIGINT) AS sim
    FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.cid <> b.cid
),
sel1 AS (
    SELECT query_id, cid, 1 AS step,
           CAST(simq AS DOUBLE) / 1e6 AS relevance,
           CAST(simq AS DOUBLE) / 1e6 AS mmr_score
    FROM (
        SELECT query_id, cid, simq,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY simq DESC, cid ASC
               ) AS rn
        FROM cand
    ) WHERE rn = 1
),
selected1 AS (SELECT query_id, cid FROM sel1)"""
    ]
    for s in range(2, _MMR_KS + 1):
        score = f"({lam_i} * simq - {one_m_i} * maxsim)"
        parts.append(
            f""",
scored{s} AS (
    SELECT c.query_id, c.cid, c.simq, MAX(p.sim) AS maxsim
    FROM cand c
    JOIN pair p ON p.query_id = c.query_id AND p.pa = c.cid
    JOIN selected{s - 1} t ON t.query_id = p.query_id AND t.cid = p.pb
    WHERE NOT EXISTS (
        SELECT 1 FROM selected{s - 1} x
        WHERE x.query_id = c.query_id AND x.cid = c.cid
    )
    GROUP BY 1, 2, 3
),
sel{s} AS (
    SELECT query_id, cid, {s} AS step,
           CAST(simq AS DOUBLE) / 1e6 AS relevance,
           CAST({score} AS DOUBLE) / 1e12 AS mmr_score
    FROM (
        SELECT query_id, cid, simq, maxsim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY {score} DESC, cid ASC
               ) AS rn
        FROM scored{s}
    ) WHERE rn = 1
),
selected{s} AS (
    SELECT query_id, cid FROM selected{s - 1}
    UNION ALL SELECT query_id, cid FROM sel{s}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, step, cid AS vec_id, relevance, mmr_score FROM sel{s}"
        for s in range(1, _MMR_KS + 1)
    )
    parts.append("\n" + union)
    return "".join(parts)


@q("mmr_rerank_topk", _oracle_mmr())
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (operators/retrieval.py:mmr_rerank): greedy
    λ·relevance − (1−λ)·redundancy selection of 5 from each query's
    top-15 exact-cosine candidates, the selection loop unrolled into a
    static DataFrame plan (one anti-join + bounded pair join + argmax
    window per step — no Python kernel). The oracle unrolls the same
    five steps as plain CTEs; every similarity is rounded to 6 dp
    before any comparison and the λ literals are repr-injected, so the
    greedy path is bit-identical across engines."""
    from ..operators.retrieval import mmr_rerank

    _utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(
        emb, qv, k_candidates=_MMR_KC, k_select=_MMR_KS, lam=_MMR_LAM,
        dims=64,
    )


_NFD_BUDGET = 64

_ORACLE_NFD = f"""
WITH RECURSIVE t AS (
    SELECT stratum, doc_id, n_tokens,
           ROW_NUMBER() OVER (
               PARTITION BY stratum ORDER BY n_tokens DESC, doc_id ASC
           ) AS rn
    FROM (
        SELECT source AS stratum, doc_id,
               CAST(LEN({_W}) AS BIGINT) AS n_tokens
        FROM documents
    )
),
walk AS (
    SELECT stratum, doc_id, n_tokens, rn,
           CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
    FROM t WHERE rn = 1
    UNION ALL
    SELECT t.stratum, t.doc_id, t.n_tokens, t.rn,
           CASE WHEN w.bin_fill + t.n_tokens > {_NFD_BUDGET}
                THEN w.bin_id + 1 ELSE w.bin_id END,
           CASE WHEN w.bin_fill + t.n_tokens > {_NFD_BUDGET}
                THEN t.n_tokens ELSE w.bin_fill + t.n_tokens END
    FROM walk w JOIN t ON t.stratum = w.stratum AND t.rn = w.rn + 1
)
SELECT stratum, doc_id, n_tokens, bin_id, bin_fill FROM walk
"""


@q("nfd_bin_packing", _ORACLE_NFD)
def nfd_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit-decreasing bin packing into 64-token bins per source
    (operators/packing.py:pack_bins_nfd) — keeps documents WHOLE,
    unlike sequence_packing's concat-and-split. A true recurrence
    (placement depends on the previous placement's fill), so the
    engine runs the ewma-style sorted-partition pandas kernel; the
    oracle replays the same scan as a recursive CTE stepping one rank
    at a time per stratum. Integer arithmetic end-to-end — nothing
    for float drift to flip."""
    from ..operators.packing import pack_bins_nfd

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return pack_bins_nfd(docs, budget=_NFD_BUDGET)


from ..operators.drift import psi_term_sql as _psi_term_sql  # noqa: E402

_PSI_BIN_SQL = "LEAST(CAST(n_chars // 64 AS INTEGER), 8)"

_ORACLE_PSI = f"""
WITH base AS (
    SELECT source AS grp, {_PSI_BIN_SQL} AS bin FROM documents
),
bins AS (SELECT bin, COUNT(*) AS cb FROM base GROUP BY 1),
grps AS (SELECT grp, COUNT(*) AS ng FROM base GROUP BY 1),
cells AS (SELECT grp, bin, COUNT(*) AS cgb FROM base GROUP BY 1, 2),
tot AS (
    SELECT CAST(SUM(cb) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS nb
    FROM bins
),
grid AS (
    SELECT g.grp, g.ng, b.bin, b.cb, COALESCE(c.cgb, 0) AS cgb, t.n, t.nb
    FROM grps g CROSS JOIN bins b
    LEFT JOIN cells c ON c.grp = g.grp AND c.bin = b.bin
    CROSS JOIN tot t
)
SELECT grp AS source, CAST(ng AS BIGINT) AS n_rows,
       CAST(CAST(SUM({_psi_term_sql('cgb', 'ng', 'cb', 'n', 'nb', 1.0)})
            AS BIGINT) AS DOUBLE) / 1e9 AS psi
FROM grid
GROUP BY 1, 2
"""


@q("source_drift_psi", _ORACLE_PSI)
def source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's char-length
    distribution against the whole corpus (operators/drift.py:
    psi_drift) — the per-slice drift audit a sharded 100 TB ingest
    runs before trusting a new crawl. Bins are deterministic
    64-char-wide buckets capped at 8; Laplace smoothing makes empty
    bins finite; per-bin terms sum as scaled BIGINTs."""
    from ..operators.drift import psi_drift

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    bin_col = F.expr("LEAST(CAST(n_chars DIV 64 AS INT), 8)")
    return psi_drift(docs, "source", bin_col, smoothing=1.0)


_ORACLE_ENTROPY = """
WITH d AS (SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 1),
chars AS (
    SELECT doc_id, SUBSTRING(text, CAST(i AS INTEGER), 1) AS c
    FROM d, UNNEST(RANGE(1, LEN(text) + 1)) AS r(i)
),
counts AS (SELECT doc_id, c, COUNT(*) AS nc FROM chars GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(SUM(nc) AS BIGINT) AS n FROM counts GROUP BY 1)
SELECT doc_id, n AS n_chars,
       CAST(CAST(SUM(CAST(ROUND(
           -(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
           * LOG2(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT))
           AS BIGINT) AS DOUBLE) / 1e9 AS entropy
FROM counts JOIN tot USING (doc_id)
GROUP BY 1, 2
"""


@q("char_entropy_scores", _ORACLE_ENTROPY)
def char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy
    (operators/text.py:char_entropy) — the cheap gibberish/binary
    detector. Characters enumerate by position (identical 1-indexed
    SUBSTRING semantics in both engines); each −p·log2(p) term sums
    as a scaled BIGINT."""
    from ..operators.text import char_entropy

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return char_entropy(docs)


_DECON_TAU = 0.4


def _oracle_embdecon() -> str:
    """Cross-split embedding decontamination replay: md5 hash split on
    vec_id, brute-force nearest-train cosine per test probe, flag from
    the UNROUNDED cosine (max_cos rounds only for the hash)."""
    from .driver_queries import cos_sql

    b = _md5_bucket_sql("vec_id")
    return f"""
WITH lab AS (SELECT vec_id, embedding, {b} AS bkt FROM embeddings),
tr AS (SELECT vec_id AS cid, embedding AS cv FROM lab WHERE bkt < 204),
te AS (SELECT vec_id AS probe_id, embedding AS pv FROM lab WHERE bkt >= 230),
sc AS (
    SELECT te.probe_id, tr.cid, {cos_sql('te.pv', 'tr.cv')} AS cos
    FROM tr CROSS JOIN te
)
SELECT probe_id, nearest_id, max_cos, contaminated FROM (
    SELECT probe_id, cid AS nearest_id, ROUND(cos, 6) AS max_cos,
           cos >= {_DECON_TAU!r} AS contaminated,
           ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, cid ASC
           ) AS rn
    FROM sc
) WHERE rn = 1
"""


@q("embedding_decontamination", _oracle_embdecon())
def embedding_decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination over the engine's own hash
    split (operators/similarity.py:embedding_decontamination): each
    test-split probe's nearest train-split vector by cosine, flagged
    at τ=0.4 — the semantic companion to ngram_decontamination
    (paraphrased leakage shares no 5-gram but stays close in embedding
    space). The probe side broadcasts; the corpus scans once."""
    from ..operators.sampling import hash_bucket
    from ..operators.similarity import embedding_decontamination

    _utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    b = hash_bucket("vec_id")
    # testdata parquet is ONE row group → one scan partition; the
    # probe×corpus cosine work is CPU-bound (HOF aggregates don't
    # codegen), so spread the corpus side first (22.6 → 1.0 s at
    # sf0.1). Real corpora split at maxPartitionBytes on their own.
    train = emb.filter(b < 204).repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    return embedding_decontamination(
        train,
        emb.filter(b >= 230).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        ),
        threshold=_DECON_TAU,
        dims=64,
    )


# ---------------------------------------------------------------------------
# TextRank keywords (integer PageRank) + Naive Bayes domain routing
# ---------------------------------------------------------------------------

_TR_SCALE, _TR_K, _TR_ITERS = 10**12, 30, 3


def _oracle_textrank() -> str:
    """TextRank replay: the zip-slice bigram graph, then the power
    iteration unrolled one CTE per round in the SAME scaled-integer
    arithmetic as operators/clustering.py:pagerank_scaled — ranks are
    BIGINTs, so the oracle compares exactly, no float tolerance."""
    parts = [
        rf"""
WITH tk AS (
    SELECT LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
                          t -> LOWER(t)) AS w
    FROM documents
),
bg AS (
    SELECT w[i] AS prev, w[i + 1] AS cur
    FROM tk, UNNEST(RANGE(1, LEN(w))) AS r(i)
    WHERE LEN(w) >= 2
),
e AS (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT prev AS src, cur AS dst FROM bg WHERE prev <> cur
        UNION ALL
        SELECT cur AS src, prev AS dst FROM bg WHERE prev <> cur
    ) GROUP BY 1, 2
),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum FROM e GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM e),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
p0 AS (
    SELECT node, CAST({_TR_SCALE} // n AS BIGINT) AS r
    FROM nodes CROSS JOIN st
)"""
    ]
    for it in range(1, _TR_ITERS + 1):
        parts.append(
            f""",
inc{it} AS (
    SELECT e.dst AS node, CAST(SUM((p.r * e.w) // o.wsum) AS BIGINT) AS s
    FROM e JOIN p{it - 1} p ON p.node = e.src
    JOIN outw o ON o.src = e.src
    GROUP BY 1
),
p{it} AS (
    SELECT nodes.node,
           CAST((15 * ({_TR_SCALE} // n)) // 100
                + (85 * COALESCE(inc{it}.s, 0)) // 100 AS BIGINT) AS r
    FROM nodes CROSS JOIN st
    LEFT JOIN inc{it} ON inc{it}.node = nodes.node
)"""
        )
    parts.append(
        f"""
SELECT pos, keyword, rank_i FROM (
    SELECT node AS keyword, r AS rank_i,
           CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node ASC) AS INTEGER)
               AS pos
    FROM p{_TR_ITERS}
) WHERE pos <= {_TR_K}"""
    )
    return "".join(parts)


@q("textrank_keywords", _oracle_textrank())
def textrank_keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank keywords (operators/text.py:
    textrank_keywords): weighted PageRank over the adjacent-token
    co-occurrence graph, three power iterations in exact
    scaled-integer arithmetic — bit-identical ranks on any engine and
    any partitioning, the oracle replays the integer recurrence CTE
    per round."""
    from ..operators.text import textrank_keywords

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return textrank_keywords(docs, k=_TR_K, iterations=_TR_ITERS)


def _oracle_nb() -> str:
    """NB domain-routing replay: closed-form training aggregates on
    the train split, the sparse prior/floor/Δ decomposition, exact
    integer score assembly, per-doc argmax with class tie-break."""
    return rf"""
WITH b AS (SELECT doc_id, text, source, {_BUCKET} AS bkt FROM documents),
trt AS (
    SELECT source AS cls, LOWER(t.tok) AS token
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt < 204
),
lm AS (SELECT cls, token, COUNT(*) AS cnt FROM trt GROUP BY 1, 2),
voc AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM lm),
nd AS (SELECT source AS cls, COUNT(*) AS ndc FROM b WHERE bkt < 204 GROUP BY 1),
ndall AS (SELECT COUNT(*) AS nall FROM b WHERE bkt < 204),
cls AS (
    SELECT nd.cls,
           CAST(ROUND(LN(CAST(ndc AS DOUBLE) / CAST(nall AS DOUBLE)) * 1e9)
               AS BIGINT) AS prior_i,
           CAST(ROUND(LN(1.0 / GREATEST(CAST(COALESCE(tc, 0) AS DOUBLE)
               + CAST(v AS DOUBLE), 1.0)) * 1e9) AS BIGINT) AS floor_i
    FROM nd
    LEFT JOIN (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tc FROM lm GROUP BY 1)
        lmc ON lmc.cls = nd.cls
    CROSS JOIN voc CROSS JOIN ndall
),
delta AS (
    SELECT cls, token,
           CAST(ROUND(LN(CAST(cnt AS DOUBLE) + 1.0) * 1e9) AS BIGINT) AS d
    FROM lm
),
te AS (
    SELECT doc_id, source AS actual,
           LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
                          t -> LOWER(t)) AS w
    FROM b WHERE bkt >= 230
),
ten AS (SELECT doc_id, actual, CAST(LEN(w) AS BIGINT) AS ntok FROM te),
tetok AS (SELECT doc_id, UNNEST(w) AS token FROM te),
sd AS (
    SELECT t.doc_id, d.cls, CAST(SUM(d.d) AS BIGINT) AS sdv
    FROM tetok t JOIN delta d USING (token) GROUP BY 1, 2
),
scored AS (
    SELECT ten.doc_id, ten.actual, ten.ntok, c.cls,
           c.prior_i + ten.ntok * c.floor_i + COALESCE(sd.sdv, 0) AS score_i
    FROM ten CROSS JOIN cls c
    LEFT JOIN sd ON sd.doc_id = ten.doc_id AND sd.cls = c.cls
)
SELECT doc_id, predicted, actual, is_correct, n_tokens, score FROM (
    SELECT doc_id, cls AS predicted, actual, (cls = actual) AS is_correct,
           ntok AS n_tokens, CAST(score_i AS DOUBLE) / 1e9 AS score,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score_i DESC, cls ASC
           ) AS rn
    FROM scored
) WHERE rn = 1
"""


@q("nb_domain_routing", _oracle_nb())
def nb_domain_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes domain routing over the engine's own hash split
    (operators/text.py:nb_classify): a bag-of-words NB model trained
    on the train split's source labels classifies each test-split
    document — the domain-tagging stage before domain-aware mixing.
    Training is closed-form aggregation; scores assemble as exact
    scaled BIGINTs via the sparse prior/floor/Δ decomposition."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import nb_classify

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    out = nb_classify(docs.filter(b < 204), docs.filter(b >= 230))
    actual = docs.select("doc_id", F.col("source").alias("actual"))
    return out.join(actual, "doc_id").select(
        "doc_id",
        "predicted",
        "actual",
        (F.col("predicted") == F.col("actual")).alias("is_correct"),
        "n_tokens",
        "score",
    )


# ---------------------------------------------------------------------------
# Interval-overlap join (bucket-blocked) + CCNet head/middle/tail buckets
# ---------------------------------------------------------------------------

_ORACLE_CONCURRENT = """
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           epoch_us(ts) // 1000000 AS sec
    FROM events
),
iv AS (
    SELECT d, user_id, MIN(sec) AS s, MAX(sec) AS e
    FROM ev GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
p AS (
    SELECT a.d, LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS ov
    FROM iv a JOIN iv b
      ON a.d = b.d AND a.user_id < b.user_id
     AND a.s <= b.e AND b.s <= a.e
)
SELECT d AS date, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS total_overlap_seconds
FROM p WHERE ov >= 1800
GROUP BY 1
"""


@q("concurrent_activity_pairs", _ORACLE_CONCURRENT)
def concurrent_activity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (operators/asof.py:
    interval_overlap_pairs): per-user daily activity intervals (≥5
    events) paired when they overlap ≥30 min, aggregated per day. The
    engine explodes intervals into hour buckets and hash-joins on the
    bucket — result-identical to the naive quadratic overlap join the
    oracle runs (accelerator equivalence), with shuffle ∝ spans/bucket
    instead of n² nested-loop probes. Pure integer epoch arithmetic —
    nothing for float drift to flip."""
    from ..operators.asof import interval_overlap_pairs
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000")
    iv = (
        events.select(
            F.col("user_id"), F.to_date("ts").alias("d"), sec.alias("sec")
        )
        .groupBy("d", "user_id")
        .agg(
            F.count("*").alias("_n"),
            F.min("sec").alias("s"),
            F.max("sec").alias("e"),
        )
        .filter(F.col("_n") >= 5)
        .select(
            F.concat_ws(
                "|", F.col("d").cast("string"), F.col("user_id").cast("string")
            ).alias("iid"),
            F.col("d"),
            "s",
            "e",
        )
    )
    pairs = interval_overlap_pairs(
        iv, "iid", "s", "e", bucket_seconds=3600, min_overlap_seconds=1800
    )
    dated = pairs.select(
        F.to_date(F.split("id_a", r"\|")[0]).alias("date"),
        "overlap_seconds",
    )
    return dated.groupBy("date").agg(
        F.count("*").alias("n_pairs"),
        F.sum("overlap_seconds").alias("total_overlap_seconds"),
    )


def _oracle_ccnet() -> str:
    """Head/middle/tail replay: the unigram-LM scoring CTEs over ALL
    documents (LM trained on the hash-split train side), per-language
    rank terciles via exact integer arithmetic."""
    return rf"""
WITH b AS (SELECT doc_id, text, lang, {_BUCKET} AS bkt FROM documents),
lm AS (
    SELECT LOWER(t.tok) AS token, COUNT(*) AS c
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt < 204
    GROUP BY 1
),
stats AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM lm),
tok AS (
    SELECT doc_id AS _doc, LOWER(t.tok) AS token
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
),
sc AS (
    SELECT _doc AS doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CAST(ROUND(LN((CAST(COALESCE(c, 0) AS DOUBLE) + 1.0)
               / (CAST(total AS DOUBLE) + CAST(v AS DOUBLE))) * 1e9) AS BIGINT))
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS avg_logprob
    FROM tok LEFT JOIN lm USING (token) CROSS JOIN stats
    GROUP BY 1
),
l AS (SELECT sc.*, b.lang FROM sc JOIN b USING (doc_id)),
r AS (
    SELECT doc_id, lang, n_tokens, avg_logprob,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY avg_logprob DESC, doc_id ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM l
)
SELECT doc_id, lang, n_tokens, avg_logprob,
       CASE WHEN rn <= (n + 2) // 3 THEN 'head'
            WHEN rn <= (2 * n + 2) // 3 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


@q("ccnet_quality_buckets", _oracle_ccnet())
def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing (operators/text.py:
    lm_quality_buckets): every document scored under the train-split
    unigram LM, each language split into score terciles by exact
    integer rank arithmetic (rank·3 ≤ n) — the published CCNet
    selection step, with nothing percentile-interpolated to drift
    across engines."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import lm_quality_buckets

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return lm_quality_buckets(docs, docs.filter(hash_bucket("doc_id") < 204))


_ORACLE_GOPHER_RULES = rf"""
WITH w AS (
    SELECT doc_id,
           LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'),
                       x -> x <> '') AS toks
    FROM documents
),
s AS (
    SELECT doc_id,
           CAST(LEN(toks) AS BIGINT) AS n_words,
           LEN(ARRAY_TO_STRING(toks, ''))
               / GREATEST(LEN(toks), 1) AS mean_word_len,
           LEN(LIST_FILTER(toks, x -> REGEXP_MATCHES(x, '[A-Za-z]')))
               / GREATEST(LEN(toks), 1) AS alpha_word_frac,
           CAST(LEN(LIST_FILTER(
               ['the','be','to','of','and','that','have','with'],
               st -> LIST_CONTAINS(LIST_TRANSFORM(toks, t -> LOWER(t)), st)
           )) AS BIGINT) AS stopword_hits
    FROM w
)
SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stopword_hits,
       (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
           AS flag_mean_word_len,
       (alpha_word_frac >= 0.80) AS flag_alpha_words,
       (stopword_hits >= 2) AS flag_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (alpha_word_frac >= 0.80)
        AND (stopword_hits >= 2)) AS keep
FROM s
"""


@q("gopher_quality_rules", _ORACLE_GOPHER_RULES)
def gopher_quality_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 page-quality rule gate (operators/quality.py:
    gopher_quality_rules): word-count / mean-word-length /
    alphabetic-fraction / required-stopword flags and the combined
    keep verdict. Row-local built-ins only — a map-only, codegen'd
    scan filter; the published thresholds are literals in both
    engines, and every fraction is one int/int double division."""
    from ..operators.quality import gopher_quality_rules

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_rules(docs)


_ORACLE_GOPHER_REP = rf"""
WITH w AS (
    SELECT doc_id, LEN(text) AS n_chars,
           LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'),
                       x -> x <> '') AS toks
    FROM documents
),
g AS (
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
    FROM w, UNNEST(RANGE(1, LEN(toks))) AS r(i)
    WHERE LEN(toks) >= 2
),
c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
agg AS (
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_grams,
           CAST(COALESCE(SUM(CASE WHEN cnt > 1
                         THEN cnt * LEN(gram) END), 0) AS BIGINT)
               AS dup_chars
    FROM c GROUP BY 1
),
top AS (
    SELECT doc_id, gram AS top_gram, cnt * LEN(gram) AS top_chars
    FROM c
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) = 1
)
SELECT w.doc_id,
       COALESCE(agg.n_grams, 0) AS n_grams,
       COALESCE(agg.dup_chars, 0) * 1.0 / GREATEST(w.n_chars, 1)
           AS dup_gram_char_frac,
       top.top_gram,
       COALESCE(top.top_chars, 0) * 1.0 / GREATEST(w.n_chars, 1)
           AS top_gram_char_frac
FROM w
LEFT JOIN agg USING (doc_id)
LEFT JOIN top ON top.doc_id = w.doc_id
"""


@q("gopher_repetition_signals", _ORACLE_GOPHER_REP)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (operators/quality.py:
    gopher_repetition): duplicate word-bigram character fraction and
    top-bigram share per document — the boilerplate/spam detector run
    before dedup. One doc-keyed token window + one partially-aggregated
    (doc, gram) count; shuffle ∝ distinct grams per document. Exact
    integer aggregates; ties on the top gram break lexicographically in
    both engines."""
    from ..operators.quality import gopher_repetition

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return gopher_repetition(docs, n=2)


def _oracle_source_overlap() -> str:
    from .oracle_shared import _W

    return f"""
WITH g AS (
    SELECT doc_id, source,
           LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, LEN({_W}) - 2),
               i -> ARRAY_TO_STRING(({_W})[i : i + 3], ' ')
           )) AS grams
    FROM documents WHERE LEN({_W}) >= 4
),
sg AS (
    SELECT DISTINCT source AS src, UNNEST(grams) AS gram FROM g
),
tot AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM sg GROUP BY src),
sh AS (
    SELECT a.src AS source_a, b.src AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sg a JOIN sg b ON a.gram = b.gram AND a.src < b.src
    GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared, ta.n AS n_a, tb.n AS n_b,
       n_shared * 1.0 / (ta.n + tb.n - n_shared) AS jaccard
FROM sh
JOIN tot ta ON ta.src = source_a
JOIN tot tb ON tb.src = source_b
"""


@q("source_ngram_overlap", _oracle_source_overlap())
def source_ngram_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-shard word-4-gram overlap matrix (operators/quality.py:
    source_ngram_overlap) — the CCNet-style crawl-redundancy audit.
    Distinct (source, gram) postings self-join on gram: expansion
    bounded by C(#sources, 2) per gram, never document fan-out;
    per-source totals broadcast; Jaccard is one int/int division."""
    from ..operators.quality import source_ngram_overlap

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return source_ngram_overlap(docs, n=4)


_EPOCH_BUDGET = 10_000


def _oracle_epoch_mix() -> str:
    from .oracle_shared import _W

    bkt = (
        "(INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
        " + (INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
    )
    return f"""
WITH t AS (
    SELECT doc_id, source, CAST(LEN({_W}) AS BIGINT) AS n_tokens,
           {bkt} AS bkt
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT)
               AS src_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY bkt, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS BIGINT) AS cum_before
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(
           (CASE WHEN src_tokens > 0
                 THEN {_EPOCH_BUDGET} // src_tokens ELSE 0 END)
           + (CASE WHEN cum_before <
                   (CASE WHEN src_tokens > 0
                         THEN {_EPOCH_BUDGET} % src_tokens ELSE 0 END)
              THEN 1 ELSE 0 END)
       AS BIGINT) AS repeat_count
FROM c
"""


@q("epoch_mix_plan", _oracle_epoch_mix())
def epoch_mix_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe epoching (operators/sampling.py:epoch_mix_plan):
    per-document repeat counts hitting a 10k-token budget per source —
    whole epochs by integer DIV, the remainder filled by one extra pass
    over a hash-ordered prefix ('e|'-salted coin; greedy prefix via a
    per-source window cumsum, the sequence_packing shape). Exact
    integer arithmetic end to end."""
    from ..operators.sampling import epoch_mix_plan

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return epoch_mix_plan(docs, tokens_per_source=_EPOCH_BUDGET)


def _oracle_oov() -> str:
    from .oracle_shared import _BUCKET, _W

    return f"""
WITH v0 AS (
    SELECT doc_id,
           UNNEST(LIST_DISTINCT(LIST_TRANSFORM({_W}, t -> LOWER(t)))) AS tok
    FROM documents WHERE {_BUCKET} < 204
),
v AS (SELECT tok FROM v0 GROUP BY tok HAVING COUNT(*) >= 2),
t AS (
    SELECT doc_id, UNNEST(LIST_TRANSFORM({_W}, t -> LOWER(t))) AS tok
    FROM documents
),
p AS (
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
    FROM t LEFT JOIN v ON t.tok = v.tok GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_oov, 0) AS n_oov,
       COALESCE(p.n_oov, 0) * 1.0 / GREATEST(COALESCE(p.n_tokens, 0), 1)
           AS oov_rate
FROM documents d LEFT JOIN p USING (doc_id)
"""


@q("vocab_oov_rate", _oracle_oov())
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep coverage audit (operators/quality.py:oov_rate):
    per-document OOV rate against the vocabulary of tokens seen in ≥2
    documents of the content-hash train split (unsalted bucket < 204 —
    the canonical SPLIT identity). The vocabulary is a
    vocabulary-sized aggregate of the reference split only, broadcast
    to the scoring join; counts exact, rate one int/int division."""
    from ..operators.quality import oov_rate
    from ..operators.sampling import hash_bucket

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return oov_rate(docs, docs.filter(hash_bucket("doc_id") < 204), min_doc_freq=2)


_CM_WIDTH, _CM_DEPTH = 2048, 4


def _cm_bucket_sql(width: int) -> str:
    """DuckDB twin of operators/frequency.py:cm_bucket (addressing
    v2) — md5 of 'cm{depth_row}|{token}', first 8 hex digits as a
    32-bit value mod ``width`` (columns ``depth_row`` and ``token`` in
    scope)."""
    h = "MD5('cm' || CAST(depth_row AS VARCHAR) || '|' || token)"

    def digit(i: int) -> str:
        return f"(INSTR('0123456789abcdef', SUBSTRING({h}, {i}, 1)) - 1)"

    value = " + ".join(
        f"{digit(i + 1)} * {16 ** (7 - i)}" if i < 7 else digit(8)
        for i in range(8)
    )
    return f"(CAST(({value}) AS BIGINT) % {width})"


def _oracle_cm() -> str:
    from .oracle_shared import _W

    b = _cm_bucket_sql(_CM_WIDTH)
    return f"""
WITH toks AS (
    SELECT LOWER(t.tok) AS token FROM documents, UNNEST({_W}) AS t(tok)
),
keys AS (
    SELECT DISTINCT LOWER(t.tok) AS token
    FROM documents, UNNEST({_W}) AS t(tok) WHERE doc_id < 10
),
d(depth_row) AS (VALUES (0), (1), (2), (3)),
cells AS (
    SELECT depth_row, {b} AS bucket, COUNT(*) AS cnt
    FROM toks CROSS JOIN d GROUP BY 1, 2
),
kb AS (SELECT token, depth_row, {b} AS bucket FROM keys CROSS JOIN d),
est AS (
    SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_count
    FROM kb LEFT JOIN cells USING (depth_row, bucket) GROUP BY token
),
exact AS (
    SELECT token, COUNT(*) AS exact_count
    FROM toks JOIN keys USING (token) GROUP BY token
)
SELECT token, est_count, exact_count FROM est JOIN exact USING (token)
"""


@q("cm_token_counts", _oracle_cm())
def cm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency readout
    (operators/frequency.py:count_min_cells/count_min_estimate): a
    4×2048 sketch over every lowercased token occurrence, probed for
    the distinct tokens of documents 0-9, beside the exact counts. The
    oracle replays every md5 cell placement digit by digit, so the
    sketch state itself — not just a property of it — is hash-checked;
    the est ≥ exact overcount guarantee is pinned in
    tests/test_frequency.py."""
    from ..operators.frequency import count_min_cells, count_min_estimate
    from ..operators.packing import engine_safe_tokens

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.transform(engine_safe_tokens("text"), F.lower)).alias(
            "token"
        )
    )
    keys = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            F.explode(
                F.array_distinct(
                    F.transform(engine_safe_tokens("text"), F.lower)
                )
            ).alias("token")
        )
        .distinct()
    )
    # ONE corpus tokenize + ONE (token → count) aggregate feeds BOTH
    # the sketch build (weighted cells — the md5×4 placement family
    # runs per distinct token, not per occurrence) and the exact twin
    # (exact_count IS the aggregate's count); the shared subtree
    # reaches the final plan as a ReusedExchange, where the old form
    # paid two corpus tokenizes and hashed every occurrence (r9, guide
    # §1.2/§2.3 — plans/r09/cm_token_counts_{before,after}.txt).
    tokcounts = toks.groupBy("token").agg(F.count("*").alias("_cnt"))
    cells = count_min_cells(
        tokcounts, "token", _CM_WIDTH, _CM_DEPTH, weight_col="_cnt"
    )
    est = count_min_estimate(keys, cells, "token", _CM_WIDTH, _CM_DEPTH)
    exact = tokcounts.join(keys, "token", "left_semi").select(
        "token", F.col("_cnt").alias("exact_count")
    )
    return est.join(exact, "token").select(
        "token", "est_count", "exact_count"
    )


_CURVE_SIZES = [16, 64, 256, 1024, 4096]


def _oracle_curve() -> str:
    from .oracle_shared import _W

    values = ", ".join(f"({n})" for n in _CURVE_SIZES)
    return f"""
WITH tok AS (
    SELECT LOWER(t.tok) AS token FROM documents, UNNEST({_W}) AS t(tok)
),
cnts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
ranked AS (
    SELECT cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS r
    FROM cnts
),
tot AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS total FROM cnts),
sizes(vocab_size) AS (VALUES {values})
SELECT s.vocab_size,
       CAST(COALESCE(SUM(ranked.cnt), 0) AS BIGINT) AS covered_occurrences,
       tot.total AS total_occurrences,
       CAST(COALESCE(SUM(ranked.cnt), 0) AS BIGINT) * 1.0
           / GREATEST(tot.total, 1) AS coverage
FROM sizes s CROSS JOIN tot LEFT JOIN ranked ON ranked.r <= s.vocab_size
GROUP BY s.vocab_size, tot.total
"""


@q("vocab_coverage_curve", _oracle_curve())
def vocab_coverage_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing curve (operators/quality.py:
    vocab_coverage_curve): fraction of token occurrences covered by
    the top-N frequency-ranked vocabulary for N in {16..4096}. The
    top-N cut is TakeOrderedAndProject (per-partition partial top-K,
    no global sort); ranking ties break on the token string so the
    curve is engine-invariant."""
    from ..operators.quality import vocab_coverage_curve

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage_curve(docs, _CURVE_SIZES)


_UNIMAX_BUDGET, _UNIMAX_EPOCHS = 65_000, 3


def _unimax_ctes() -> str:
    """The closed-form water-filling chain over langs (src → caps →
    staged → flagged → tot), shared by the allocation oracle and the
    composed recipe oracle."""
    from .oracle_shared import _W

    b, e = _UNIMAX_BUDGET, _UNIMAX_EPOCHS
    return f"""src AS (
    SELECT lang AS source, CAST(SUM(LEN({_W})) AS BIGINT) AS source_tokens
    FROM documents GROUP BY lang
),
caps AS (
    SELECT source, source_tokens,
           CAST(source_tokens * {e} AS BIGINT) AS cap_tokens
    FROM src
),
staged AS (
    SELECT source, source_tokens, cap_tokens,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
           CAST(SUM(cap_tokens) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - cap_tokens AS BIGINT) AS p_before,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM caps
    WINDOW w AS (ORDER BY cap_tokens ASC, source ASC)
),
flagged AS (
    SELECT *,
           (p_before + cap_tokens * (n - k + 1) <= {b}) AS capped
    FROM staged
),
tot AS (
    SELECT *,
           CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()
                AS BIGINT) AS m,
           CAST(COALESCE(SUM(CASE WHEN capped THEN cap_tokens END)
                OVER (), 0) AS BIGINT) AS p_m
    FROM flagged
)"""


def _unimax_alloc_expr() -> str:
    b = _UNIMAX_BUDGET
    return f"""CAST(CASE WHEN capped THEN cap_tokens
            ELSE ({b} - p_m) // NULLIF(n - m, 0)
                 + CASE WHEN (k - m) <= ({b} - p_m) % NULLIF(n - m, 0)
                        THEN 1 ELSE 0 END
            END AS BIGINT)"""


def _oracle_unimax() -> str:
    return f"""
WITH {_unimax_ctes()}
SELECT source, source_tokens, cap_tokens,
       {_unimax_alloc_expr()} AS alloc_tokens,
       capped
FROM tot
"""


@q("unimax_allocation", _oracle_unimax())
def unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation over languages
    (operators/sampling.py:unimax_plan): a 65k-token total budget
    split as evenly as the 3-epoch repeat cap allows — small languages
    take their full cap (the ascending-cap prefix), the rest share the
    remainder in exact integer arithmetic. Both branches are live at
    every sf (the en share is ~3× the others). The oracle replays the
    closed-form prefix-sum allocation window by window."""
    from ..operators.sampling import unimax_plan

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return unimax_plan(
        docs, _UNIMAX_BUDGET, _UNIMAX_EPOCHS, source_col="lang"
    )


def _oracle_recipe() -> str:
    from .oracle_shared import _W

    bkt = (
        "(INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id AS"
        " VARCHAR)), 1, 1)) - 1) * 16"
        " + (INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id"
        " AS VARCHAR)), 2, 1)) - 1)"
    )
    return f"""
WITH {_unimax_ctes()},
budgets AS (
    SELECT source, {_unimax_alloc_expr()} AS budget FROM tot
),
t AS (
    SELECT doc_id, lang AS source, CAST(LEN({_W}) AS BIGINT) AS n_tokens,
           {bkt} AS bkt
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT)
               AS src_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY bkt, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS BIGINT) AS cum_before
    FROM t
)
SELECT c.doc_id, c.source, c.n_tokens,
       CAST(
           (CASE WHEN c.src_tokens > 0
                 THEN COALESCE(b.budget, 0) // c.src_tokens ELSE 0 END)
           + (CASE WHEN c.cum_before <
                   (CASE WHEN c.src_tokens > 0
                         THEN COALESCE(b.budget, 0) % c.src_tokens
                         ELSE 0 END)
              THEN 1 ELSE 0 END)
       AS BIGINT) AS repeat_count
FROM c LEFT JOIN budgets b USING (source)
"""


@q("recipe_epochs_unimax", _oracle_recipe())
def recipe_epochs_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data recipe, oracled end to end: ``unimax_plan``
    turns ONE total budget into per-language allocations (capped
    water-filling), and ``epoch_mix_plan(budgets=...)`` turns each
    allocation into per-document repeat counts (whole epochs + the
    hash-ordered remainder prefix). The oracle replays BOTH stages in
    one SQL chain — the composition contract, not just the parts.
    Plan: the allocation side collapses to a source-count-sized
    relation broadcast onto epoch mix's per-source window shuffle."""
    from ..operators.sampling import epoch_mix_plan, unimax_plan

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    alloc = unimax_plan(
        docs, _UNIMAX_BUDGET, _UNIMAX_EPOCHS, source_col="lang"
    )
    budgets = alloc.select(
        "source", F.col("alloc_tokens").alias("budget_tokens")
    )
    return epoch_mix_plan(docs, budgets=budgets, source_col="lang")


_QUANTILES_PM = [100, 250, 500, 750, 900, 950, 990, 1000]


def _oracle_len_quantiles() -> str:
    from .oracle_shared import _W

    values = ", ".join(f"({q})" for q in _QUANTILES_PM)
    return f"""
WITH lens AS (
    SELECT CAST(LEN({_W}) AS BIGINT) AS value FROM documents
),
hist AS (SELECT value, COUNT(*) AS cnt FROM lens GROUP BY value),
tot AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n FROM hist),
cum AS (
    SELECT value,
           CAST(SUM(cnt) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS c
    FROM hist
),
spine(q_permille) AS (VALUES {values})
SELECT s.q_permille, MIN(cum.value) AS value
FROM spine s
CROSS JOIN tot
LEFT JOIN cum ON cum.c >= GREATEST((tot.n * s.q_permille + 999) // 1000, 1)
GROUP BY s.q_permille
"""


@q("doc_length_quantiles", _oracle_len_quantiles())
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-length quantiles of the documents corpus via the
    value-histogram form (operators/aggregates.py:histogram_quantiles)
    — the sequence-length audit that sizes packing budgets and context
    windows. No row buffering: a distinct-length-bounded histogram +
    one ordered cumsum, ranks in exact per-mille integer arithmetic
    (a float CEIL(q×n) can land one off cross-engine). The oracle
    replays the histogram, cumsum, and rank thresholds verbatim."""
    from ..operators.aggregates import histogram_quantiles
    from ..operators.packing import engine_safe_tokens

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        F.size(engine_safe_tokens("text")).cast("long").alias("n_tokens")
    )
    return histogram_quantiles(lens, "n_tokens", _QUANTILES_PM)


def _oracle_len_quantiles_by_lang() -> str:
    from .oracle_shared import _W

    values = ", ".join(f"({q})" for q in _QUANTILES_PM)
    return f"""
WITH lens AS (
    SELECT lang, CAST(LEN({_W}) AS BIGINT) AS value FROM documents
),
hist AS (SELECT lang, value, COUNT(*) AS cnt FROM lens GROUP BY lang, value),
tot AS (
    SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY lang
),
cum AS (
    SELECT lang, value,
           CAST(SUM(cnt) OVER (
               PARTITION BY lang ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS c
    FROM hist
),
spine AS (
    SELECT tot.lang, q.q_permille,
           GREATEST((tot.n * q.q_permille + 999) // 1000, 1) AS target
    FROM tot CROSS JOIN (VALUES {values}) AS q(q_permille)
)
SELECT s.lang, s.q_permille, MIN(cum.value) AS value
FROM spine s
JOIN cum ON cum.lang = s.lang AND cum.c >= s.target
GROUP BY s.lang, s.q_permille
"""


@q("length_quantiles_by_lang", _oracle_len_quantiles_by_lang())
def length_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact token-length quantiles
    (operators/aggregates.py:grouped_histogram_quantiles) — the
    production shape of the sequence-length audit: the cumsum window
    is PARTITIONED by language (every group ranks in parallel), and
    the quantile spine equi-joins on the group key with the rank
    threshold as residual condition (hash join, not a nested loop).
    Same per-mille integer rank arithmetic as doc_length_quantiles."""
    from ..operators.aggregates import grouped_histogram_quantiles
    from ..operators.packing import engine_safe_tokens

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "lang",
        F.size(engine_safe_tokens("text")).cast("long").alias("n_tokens"),
    )
    return grouped_histogram_quantiles(lens, "n_tokens", "lang", _QUANTILES_PM)
