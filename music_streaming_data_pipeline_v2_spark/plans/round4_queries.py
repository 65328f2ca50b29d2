"""Round-4 batch: driver-gateable ANN — the approximate similarity
surface held to the same hash-exact DuckDB gate as everything else.

Round 3 left exactly two registry entries without oracles
(`ann_lsh_topk`, `ann_ivf_topk` — approximate-by-design, seeded inside
the engine). The fix here mirrors what `minhash_lsh_oracle` did for
MinHash: make every source of randomness *engine-portable* so DuckDB
can replay the entire approximate pipeline —

- LSH: the hyperplanes were always driver-generated literals
  (operators/similarity.py:random_hyperplanes, seeded Mersenne
  Twister); inline the SAME 16×64 weights into the oracle SQL and
  DuckDB reproduces signatures → band buckets → candidates → exact
  re-rank bit-for-bit (sign bits come from identical sequential-order
  IEEE folds on identical literals).
- IVF: the k-means codebook is engine-computed, so the oracled twin
  uses a *seed-only* codebook — the 8 corpus vectors with the smallest
  md5(vec_id) — which both engines derive identically with no FP
  aggregation at all; assignment/probing are pure (cos DESC, cid ASC)
  argmins over data vectors.

On top of the two full top-k replays, `ann_lsh_recall` /
`ann_ivf_recall` reduce approximate-vs-exact agreement to one row of
counts (n_queries, k, n_exact, n_hits) — recall@k as an in-engine,
driver-hashable quantity (SURVEY §7 hard part (e)); the oracle replays
BOTH sides, so the counts are deterministic, not a pinned threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators import similarity as _sim
from .driver_queries import _utc, cos_sql as _cos_sql, q
from .oracle_shared import _ORACLE_DECONTAM

_DIMS, _BITS, _BANDS, _K, _NPROBE, _NCENT = 64, 16, 4, 10, 3, 8
_PLANES = _sim.random_hyperplanes(_DIMS, _BITS, seed=42)
_PER_BAND = _BITS // _BANDS


def _dot_w_sql(vec: str, weights: list[float]) -> str:
    """DuckDB dot(vec, literal weights) — sequential list fold, the
    same summation order as the Spark side's F.aggregate."""
    lst = "[" + ", ".join(repr(w) for w in weights) + "]"
    return (
        f"list_aggregate(list_transform(list_zip({vec}, {lst}), "
        f"x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')"
    )


def _topk_sql(scored_cte: str) -> str:
    """Rank rows of a (query_id, neighbor_id, cos) CTE to top-K."""
    return f"""(
    SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM {scored_cte}
) WHERE rank <= {_K}"""


_PROJ_COLS = ",\n           ".join(
    f"{_dot_w_sql('embedding', p)} AS p{j}" for j, p in enumerate(_PLANES)
)

_BUCKET_COLS = ", ".join(
    "("
    + " + ".join(
        f"(CASE WHEN p{b * _PER_BAND + i} >= 0 THEN 1 ELSE 0 END)"
        f" * {1 << (_PER_BAND - 1 - i)}"
        for i in range(_PER_BAND)
    )
    + f") AS b{b}"
    for b in range(_BANDS)
)

_BANDED_UNION = "\n    UNION ALL ".join(
    f"SELECT vec_id, {b} AS band_id, b{b} AS bucket FROM sig"
    for b in range(_BANDS)
)

# Shared CTE block replaying lsh_topk: signatures → band buckets →
# bucket-join candidates (dedup) → exact cosine re-rank.
_LSH_CTES = f"""
proj AS (
    SELECT vec_id, {_PROJ_COLS}
    FROM embeddings
),
sig AS (
    SELECT vec_id, {_BUCKET_COLS} FROM proj
),
banded AS (
    {_BANDED_UNION}
),
lsh_cand AS (
    SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
    FROM banded cb
    JOIN banded qb ON cb.band_id = qb.band_id AND cb.bucket = qb.bucket
    WHERE qb.vec_id < 5
),
lsh_scored AS (
    SELECT c.query_id, c.neighbor_id,
           {_cos_sql('qe.embedding', 'ne.embedding')} AS cos
    FROM lsh_cand c
    JOIN embeddings qe ON qe.vec_id = c.query_id
    JOIN embeddings ne ON ne.vec_id = c.neighbor_id
),
lsh_top AS (
    SELECT * FROM {_topk_sql('lsh_scored')}
)"""

# Exact brute-force side (same shape as ann_cosine_topk's oracle).
_EXACT_CTES = f"""
exact_scored AS (
    SELECT qx.vec_id AS query_id, ex.vec_id AS neighbor_id,
           {_cos_sql('qx.embedding', 'ex.embedding')} AS cos
    FROM embeddings ex
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) qx
),
exact_top AS (
    SELECT * FROM {_topk_sql('exact_scored')}
)"""

_ORACLE_LSH_TOPK = f"""
WITH {_LSH_CTES}
SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine FROM lsh_top
"""


@q("ann_lsh_oracle", _ORACLE_LSH_TOPK)
def ann_lsh_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-10 (operators/similarity.py:
    lsh_topk), hash-exact against a FULL DuckDB replay of the pipeline
    — the hyperplanes are the same inlined literals on both sides, so
    signatures, candidate sets, and the exact re-rank all reproduce.
    Closes round 3's `ann_lsh_topk: no_oracle` gap."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = _sim.lsh_topk(
        emb, queries, k=_K, bits=_BITS, bands=_BANDS, seed=42, dims=_DIMS
    )
    return out.withColumn("cosine", F.round("cosine", 6))


_ORACLE_LSH_RECALL = f"""
WITH {_LSH_CTES},
{_EXACT_CTES}
SELECT (SELECT COUNT(DISTINCT query_id) FROM exact_top) AS n_queries,
       {_K} AS k,
       (SELECT COUNT(*) FROM exact_top) AS n_exact,
       (SELECT COUNT(*) FROM exact_top e
        JOIN lsh_top l ON e.query_id = l.query_id
                      AND e.neighbor_id = l.neighbor_id) AS n_hits
"""


@q("ann_lsh_recall", _ORACLE_LSH_RECALL)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of LSH vs exact brute force as an in-engine reduction
    (SURVEY §7 hard part (e)): semi-join the approximate top-k against
    the exact top-k and count agreements. One row of integers — the
    approximate surface's quality is a driver-hashed quantity, and the
    oracle REPLAYS both sides rather than pinning a threshold."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _sim.cosine_topk(emb, queries, k=_K, dims=_DIMS)
    approx = _sim.lsh_topk(
        emb, queries, k=_K, bits=_BITS, bands=_BANDS, seed=42, dims=_DIMS
    )
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select("n_queries", F.lit(_K).alias("k"), "n_exact", "n_hits")
    )


# IVF with a seed-only codebook: the 8 corpus vectors of smallest
# md5(vec_id), cid = rank in that order. No FP aggregation anywhere in
# codebook construction, so both engines hold bit-identical centroids.
_SEED_CTES = f"""
seeds AS (
    SELECT embedding AS cv,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS cid
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_NCENT}
),
assigned AS (
    SELECT vec_id AS neighbor_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 's.cv')} DESC,
                            s.cid ASC) AS rn
        FROM embeddings e CROSS JOIN seeds s
    ) WHERE rn = 1
),
probes AS (
    SELECT query_id, qv, cid FROM (
        SELECT qp.vec_id AS query_id, qp.embedding AS qv, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY qp.vec_id
                   ORDER BY {_cos_sql('qp.embedding', 's.cv')} DESC,
                            s.cid ASC) AS prn
        FROM embeddings qp CROSS JOIN seeds s
        WHERE qp.vec_id < 5
    ) WHERE prn <= {_NPROBE}
),
ivf_scored AS (
    SELECT p.query_id, a.neighbor_id,
           {_cos_sql('p.qv', 'a.embedding')} AS cos
    FROM assigned a JOIN probes p USING (cid)
),
ivf_top AS (
    SELECT * FROM {_topk_sql('ivf_scored')}
)"""


def _md5_seed_codebook(emb: DataFrame) -> list[list[float]]:
    """Collect the md5-seeded codebook (tiny: n_centroids × dims) in
    the SAME order the oracle's ROW_NUMBER assigns cids."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(_NCENT)
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


_ORACLE_IVF_TOPK = f"""
WITH {_SEED_CTES}
SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cosine FROM ivf_top
"""


@q("ann_ivf_oracle", _ORACLE_IVF_TOPK)
def ann_ivf_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 with the md5-seeded codebook
    (operators/similarity.py:ivf_topk — same assignment/probe/re-rank
    machinery as the k-means variant, codebook swapped for the
    engine-portable one), hash-exact against a full DuckDB replay.
    Closes round 3's `ann_ivf_topk: no_oracle` gap; the k-means-lite
    codebook variant stays registered as the production path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = _sim.ivf_topk(
        emb, queries, _md5_seed_codebook(emb), k=_K, nprobe=_NPROBE, dims=_DIMS
    )
    return out.withColumn("cosine", F.round("cosine", 6))


_ORACLE_IVF_RECALL = f"""
WITH {_SEED_CTES},
{_EXACT_CTES}
SELECT (SELECT COUNT(DISTINCT query_id) FROM exact_top) AS n_queries,
       {_K} AS k,
       (SELECT COUNT(*) FROM exact_top) AS n_exact,
       (SELECT COUNT(*) FROM exact_top e
        JOIN ivf_top i ON e.query_id = i.query_id
                      AND e.neighbor_id = i.neighbor_id) AS n_hits
"""


@q("ann_ivf_recall", _ORACLE_IVF_RECALL)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of seeded-codebook IVF vs exact brute force — same
    one-row reduction as ann_lsh_recall, oracle replays both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _sim.cosine_topk(emb, queries, k=_K, dims=_DIMS)
    approx = _sim.ivf_topk(
        emb, queries, _md5_seed_codebook(emb), k=_K, nprobe=_NPROBE, dims=_DIMS
    )
    hits = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select("n_queries", F.lit(_K).alias("k"), "n_exact", "n_hits")
    )


_ORACLE_RESIZE = """
WITH media AS (
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(doc_id % 640 + 16 AS INT) AS w,
           CAST(doc_id % 480 + 16 AS INT) AS h
    FROM documents
)
SELECT media_id, modality,
       CAST(CASE WHEN modality = 'image' AND GREATEST(w, h) > 100
            THEN CASE WHEN w >= h THEN 100
                      ELSE GREATEST((w * 100) // h, 1) END
            ELSE w END AS INT) AS width,
       CAST(CASE WHEN modality = 'image' AND GREATEST(w, h) > 100
            THEN CASE WHEN w >= h THEN GREATEST((h * 100) // w, 1)
                      ELSE 100 END
            ELSE h END AS INT) AS height,
       CASE WHEN modality = 'image' AND GREATEST(w, h) > 100
            THEN 'synthetic+resized' ELSE 'synthetic' END AS fmt
FROM media
"""


@q("multimodal_resize_geometry", _ORACLE_RESIZE)
def multimodal_resize_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_images (operators/multimodal.py) end-to-end on driver
    testdata: documents' bytes stand in for blobs with synthetic
    width/height metadata; the Arrow-batched mapInPandas kernel
    computes the aspect-preserving fit-to-100 geometry and the oracle
    replays the identical arithmetic (long side = exactly 100, short
    side = integer floor-division, clamp to 1) in SQL — pure integer
    math on both engines, no IEEE intermediate — pinning the
    geometry contract every downstream consumer (feature extraction,
    packing) depends on, independent of which codec kernel runs."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").cast("binary").alias("content"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("format"),
        ).alias("meta"),
    )
    # image_kernel pinned to 'bytes': the oracle checks the GEOMETRY
    # contract on synthetic non-image payloads; the real codec kernels
    # ('auto' → pillow/ppm) correctly refuse to describe bytes they
    # can't decode and would pass these rows through untouched
    return resize_images(media, max_dim=100, image_kernel="bytes").select(
        "media_id",
        "modality",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.format").alias("fmt"),
    )


_SQL_LATERAL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 2
) t
"""


_ORACLE_UDTF_TOKENS = r"""
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, t.toks[u.i] AS token
FROM (SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(text, '[ \t\n\r\f]+'),
                         x -> x <> '') AS toks
      FROM documents) t,
     UNNEST(RANGE(1, LEN(t.toks) + 1)) AS u(i)
"""


@q("udtf_positional_tokens", _ORACLE_UDTF_TOKENS)
def udtf_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SQL table function, the §2.11 API surface the
    reference never needed): positional tokenization as a LATERAL
    table function — one input row expands to (pos, token) rows inside
    the generator, invoked from SQL exactly like a built-in. This is
    the extensibility exemplar for row→rows kernels (the row→row and
    group→rows analogs are the click_purchase_funnel applyInPandas and
    multimodal mapInPandas demos); the ORACLE replays it with pure
    SQL UNNEST arithmetic, so the gate pins the UDTF's semantics, and
    the hot-path production equivalent stays the codegen
    posexplode+lead form (text.py:word_ngram_postings docstring).
    The kernel is pickle-by-value self-contained (imports inside)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class _Tokenize:
        def eval(self, text: str):
            import re

            if text is None:
                return
            toks = [x for x in re.split(r"[ \t\n\r\f]+", text) if x]
            for i, t in enumerate(toks):
                yield i, t

    spark.udtf.register("tokenize_udtf", _Tokenize)
    from .driver_queries import _register

    _register(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM documents d, LATERAL tokenize_udtf(d.text) t"
    )


def _zorder_oracle() -> str:
    from ..operators.zorder import zvalue_sql

    z = zvalue_sql(
        "(o_custkey % 4096)",
        "(DATEDIFF('day', DATE '1992-01-01', o_orderdate) % 4096)",
        12,
    )
    return f"""
SELECT o_orderkey,
       o_custkey % 4096 AS x,
       DATEDIFF('day', DATE '1992-01-01', o_orderdate) % 4096 AS y,
       {z} AS zvalue
FROM orders
"""


@q("zorder_values", _zorder_oracle())
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton codes for the (customer, day) serving layout
    (operators/zorder.py): interleave 12 bits of customer key with 12
    bits of day ordinal — the write-side clustering that lets file
    min/max stats prune scans on EITHER dimension (zorder_layout
    applies it; tests/test_zorder.py proves the bounded-rectangle
    property of the resulting files). Pure integer shift/mask/or on
    both engines — the oracle replays the identical arithmetic."""
    from ..operators.zorder import zvalue_sql

    _utc(spark)
    orders = load_table(spark, sf_dir, "orders")
    z = zvalue_sql("x", "y", 12)
    return (
        orders.select(
            "o_orderkey",
            F.expr("o_custkey % 4096").alias("x"),
            F.expr(
                # cast: Spark datediff is INT where DuckDB DATEDIFF is
                # BIGINT — align so the gate's type-sensitive compare
                # can never diverge on representation (r4 lesson)
                "CAST(datediff(to_date(o_orderdate), DATE '1992-01-01') % 4096 AS BIGINT)"
            ).alias("y"),
        )
        .select("o_orderkey", "x", "y", F.expr(z).alias("zvalue"))
    )


_HH_FRACTION = 0.005

_ORACLE_HEAVY_TOKENS = r"""
WITH tok AS (
    SELECT UNNEST(LIST_FILTER(
        STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'), x -> x <> ''
    )) AS value
    FROM documents
),
n AS (SELECT COUNT(*) AS total FROM tok)
SELECT tok.value, COUNT(*) AS n_occurrences
FROM tok, n
GROUP BY tok.value, n.total
HAVING COUNT(*) >= CEIL(0.005 * n.total)
"""


@q("heavy_hitter_tokens", _ORACLE_HEAVY_TOKENS)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (tokens with frequency ≥ 0.5%) via
    Misra-Gries partition summaries + exact verification
    (operators/frequency.py:frequent_items). The sketch bounds the
    shuffle to n_partitions × k rows — independent of vocabulary size,
    the quantity that explodes at 100 TB — and the exact verify pass
    makes the output identical to the full groupBy, so the oracle is
    the plain HAVING-count SQL (accelerator equivalence, the
    bloom/salted pattern)."""
    from ..operators.frequency import frequent_items
    from ..operators.packing import ENGINE_SAFE_WS

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim("text"), ENGINE_SAFE_WS)).alias("value")
    ).filter(F.col("value") != "")
    return frequent_items(tok, "value", min_fraction=_HH_FRACTION)


_SEM_THRESHOLD = 0.35

_ORACLE_SEMANTIC_DEDUP = f"""
WITH seeds AS (
    SELECT embedding AS cv,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS cid
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_NCENT}
),
assigned AS (
    SELECT vec_id AS id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 's.cv')} DESC,
                            s.cid ASC) AS rn
        FROM embeddings e CROSS JOIN seeds s
    ) WHERE rn = 1
),
dropped AS (
    SELECT DISTINCT b.id
    FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.id < b.id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_SEM_THRESHOLD}
)
SELECT a.id, a.cid AS centroid_id, d.id IS NULL AS kept
FROM assigned a LEFT JOIN dropped d USING (id)
"""


@q("semantic_dedup_decisions", _ORACLE_SEMANTIC_DEDUP)
def semantic_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings corpus
    (operators/similarity.py:semantic_dedup): md5-seeded codebook
    (engine-portable, like ann_ivf_oracle's), map-only cluster
    assignment, within-cluster cosine pairs only — O(Σ cluster²),
    never all-pairs — and the deterministic keep-lowest-id rule.
    The oracle replays the whole pipeline: codebook, argmax
    assignment (cos DESC, cid ASC tie-break), pair mining, drop set.
    Full roster out, so the gate hashes both kept and dropped."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _sim.semantic_dedup(
        emb, _md5_seed_codebook(emb), threshold=_SEM_THRESHOLD, dims=_DIMS
    )


@q("bloom_decontamination", _ORACLE_DECONTAM)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ngram_decontamination` rerun through the broadcast-Bloom
    prefilter (text.py:ngram_contamination_bloom over
    bloom.py:bloom_prefilter): the test split's distinct 5-grams build
    a Bloom filter (1% fpp) that the TRAIN posting scan probes
    map-side, so only candidate grams reach the gram-keyed shuffle.
    Bloom filters have no false negatives and every candidate still
    passes the exact equi-join, so the oracle is the SAME exact SQL as
    `ngram_decontamination` — accelerator equivalence, the
    `salted_agg_equivalence` pattern. At 100 TB this is the plan that
    matters: the corpus-side shuffle shrinks to true hits + 1% noise
    instead of the corpus' whole gram inventory."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import ngram_contamination_bloom

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    # strategy pinned to 'bloom': this query EXISTS to oracle-check the
    # accelerated plan — 'auto' would (correctly) pick the plain join
    # at bench scale and the equivalence would check nothing
    return ngram_contamination_bloom(
        docs.filter(b < 204), docs.filter(b >= 230), n=5, strategy="bloom"
    )


@q("lateral_top_customers", _SQL_LATERAL)
def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table):
    per-nation top-2 customers by balance, the per-row-subquery shape
    ANSI engines express with LATERAL and Spark decorrelates into a
    ranked window join (check .explain: no per-outer-row re-execution).
    The SAME text runs on DuckDB as the oracle — extending the
    correlated-subquery dialect-compatibility block
    (driver_queries.py small_qty_orders_scalar_subq et al.) to lateral
    joins. Deterministic via the (balance DESC, name) tie-break."""
    from .driver_queries import _register

    _register(spark, sf_dir, "nation", "customer")
    return spark.sql(_SQL_LATERAL)
