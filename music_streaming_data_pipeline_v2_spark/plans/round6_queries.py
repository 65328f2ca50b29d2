"""Round-6 batch: the curation pipeline composed END TO END as one
oracled query.

Rounds 3-5 proved every curation stage individually — near-dup
clustering (``dedup_clusters``), quality-argmax representatives
(``cluster_representatives``), cluster-granular splits
(``leakage_safe_split``), UniMax allocation (``unimax_allocation``),
epoch mixing (``recipe_epochs_unimax``). This round proves the
COMPOSITION: one DataFrame plan running dedup → representatives →
quality gate → leakage-safe split → UniMax → epoch mix, with a DuckDB
oracle replaying the full chain (the shared ``_CC_CTES`` closure plus
the same water-filling and remainder-prefix arithmetic the stage
oracles pin). ``examples/curation_pipeline_demo.py`` calls the same
``operators/curation.py:curation_recipe`` function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import load_table
from .driver_queries import _utc, load_events, q
from .oracle_shared import _CC_CTES, _W, _md5_bucket_sql

# Recipe constants — chosen so every branch is LIVE at the test sfs:
# the gate drops part of the dedup survivors (both min-token and
# uniq-ratio rules fire), the split produces all three buckets, and
# the 6001-token budget sits strictly inside the total 3-epoch cap
# (~8.6-9.9k train tokens × 3) so the UniMax water-fill caps the two
# smallest languages AND shares the remainder over the rest, with the
# odd token exercising the +1 ascending-rank branch; downstream, the
# uncapped languages' budgets are not multiples of their token counts,
# so the epoch-mix remainder prefix fires too.
_E2E_BUDGET, _E2E_EPOCHS = 6_001, 3
_E2E_MIN_TOKENS, _E2E_MIN_UNIQ_PM = 20, 320

#: lower+trim whitespace token array (the cluster_representatives
#: oracle's tokenization — distinct/total over THIS array is the
#: quality ratio).
_LT = r"REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')"


def _curation_sp_ctes() -> str:
    """The recipe chain through the split assignment (``sp``) —
    shared by the e2e oracle and the curated-tokenizer oracle."""
    mt, mu = _E2E_MIN_TOKENS, _E2E_MIN_UNIQ_PM
    return f"""{_CC_CTES},
qual AS (
    SELECT d.doc_id, a.component, d.n_chars, d.lang, d.text,
           CAST(LEN(LIST_DISTINCT({_LT.replace('text', 'd.text')})) AS DOUBLE)
             / LEN({_LT.replace('text', 'd.text')}) AS uniq_ratio
    FROM documents d JOIN alldocs a ON a.doc_id = d.doc_id
),
reps AS (
    SELECT component, doc_id FROM (
        SELECT component, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY component
                   ORDER BY uniq_ratio DESC, n_chars DESC, doc_id ASC
               ) AS rn
        FROM qual
    ) WHERE rn = 1
),
kept AS (
    SELECT d.doc_id, r.component, d.lang, d.text,
           CAST(LEN({_W}) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT({_LT.replace('text', 'd.text')}))
               AS BIGINT) AS nd,
           CAST(LEN({_LT.replace('text', 'd.text')}) AS BIGINT) AS nw
    FROM documents d JOIN reps r ON d.doc_id = r.doc_id
),
gated AS (
    SELECT * FROM kept
    WHERE n_tokens >= {mt} AND 1000 * nd >= {mu} * nw
),
sp AS (
    SELECT doc_id, component, lang, n_tokens,
           CASE WHEN {_md5_bucket_sql('component')} < 204 THEN 'train'
                WHEN {_md5_bucket_sql('component')} < 230 THEN 'val'
                ELSE 'test' END AS split
    FROM gated
)"""


def _oracle_curation_e2e() -> str:
    b, e = _E2E_BUDGET, _E2E_EPOCHS
    ebkt = (
        "(INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id AS"
        " VARCHAR)), 1, 1)) - 1) * 16"
        " + (INSTR('0123456789abcdef', SUBSTRING(MD5('e|' || CAST(doc_id"
        " AS VARCHAR)), 2, 1)) - 1)"
    )
    return f"""{_curation_sp_ctes()},
train AS (SELECT * FROM sp WHERE split = 'train'),
src AS (
    SELECT lang AS source, CAST(SUM(n_tokens) AS BIGINT) AS source_tokens
    FROM train GROUP BY lang
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
),
budgets AS (
    SELECT source,
           CAST(CASE WHEN capped THEN cap_tokens
                ELSE ({b} - p_m) // NULLIF(n - m, 0)
                     + CASE WHEN (k - m) <= ({b} - p_m) % NULLIF(n - m, 0)
                            THEN 1 ELSE 0 END
                END AS BIGINT) AS budget
    FROM tot
),
t AS (
    SELECT doc_id, lang AS source, n_tokens, {ebkt} AS bkt FROM train
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
),
mix AS (
    SELECT c.doc_id,
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
)
SELECT s.doc_id, s.component, s.lang AS source, s.split, s.n_tokens,
       CAST(COALESCE(m.repeat_count, 0) AS BIGINT) AS repeat_count
FROM sp s LEFT JOIN mix m USING (doc_id)
"""


@q("curation_recipe_e2e", _oracle_curation_e2e())
def curation_recipe_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation recipe as ONE plan
    (operators/curation.py:curation_recipe): near-dup clustering →
    quality-argmax representatives → integer-exact quality gate →
    component-coined train/val/test split → UniMax water-filling over
    the train split → per-document epoch mix. Output: one row per
    surviving document with its component, split, token count, and
    training-mix repeat count (0 for held-out splits). The oracle
    replays the entire chain — closure, argmax, gate, split coin,
    water-fill, and remainder prefix — in one SQL statement, so the
    stage CONTRACTS (what each stage hands the next) are pinned, not
    just each stage in isolation."""
    from ..operators.curation import curation_recipe

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    return curation_recipe(
        docs,
        _E2E_BUDGET,
        _E2E_EPOCHS,
        jaccard_threshold=0.8,
        min_tokens=_E2E_MIN_TOKENS,
        min_uniq_permille=_E2E_MIN_UNIQ_PM,
    )


# ---------------------------------------------------------------------------
# Replayable HyperLogLog — the last rows-only sketch family gains a
# full-replay oracle sibling (the ann_lsh_oracle/simhash_oracle
# pattern applied to approx-distinct): md5-derived registers, an
# exact-integer harmonic sum, and a precomputed linear-counting table
# so neither engine evaluates ln (1-ulp JVM/DuckDB divergence,
# measured). See operators/frequency.py module comment.
# ---------------------------------------------------------------------------


def _oracle_hll() -> str:
    from ..operators.frequency import (
        HLL_ALPHA_SQL,
        HLL_M,
        HLL_RHO_CAP,
        HLL_Z_ONE,
        hll_lc_micro_table,
    )

    h = "MD5('hll|' || CAST(user_id AS VARCHAR))"

    def digit(i: int) -> str:
        return f"(INSTR('0123456789abcdef', SUBSTRING({h}, {i}, 1)) - 1)"

    w = " + ".join(
        f"CAST({digit(i + 3)} AS BIGINT) * {16 ** (11 - i)}"
        if i < 11
        else f"CAST({digit(14)} AS BIGINT)"
        for i in range(12)
    )
    lc_rows = ", ".join(
        f"({v}, {m})" for v, m in hll_lc_micro_table()
    )
    return f"""
WITH lc(v_empty, lc_micro) AS (VALUES {lc_rows}),
k AS (
    SELECT CAST(ts AS DATE) AS date,
           {digit(1)} * 16 + {digit(2)} AS bucket,
           {w} AS w
    FROM events WHERE user_id IS NOT NULL
),
rr AS (
    SELECT date, bucket,
           MAX(CASE WHEN w = 0 THEN {HLL_RHO_CAP}
                    ELSE {HLL_RHO_CAP} - LENGTH(BIN(w)) END) AS rho_max
    FROM k GROUP BY date, bucket
),
a AS (
    SELECT date,
           CAST({HLL_M} - COUNT(*) AS INT) AS v_empty,
           CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - rho_max))
                + ({HLL_M} - COUNT(*)) * {HLL_Z_ONE} AS BIGINT) AS z_scaled
    FROM rr GROUP BY date
),
e AS (
    SELECT date, v_empty, z_scaled,
           {HLL_ALPHA_SQL} * 65536.0 * 562949953421312.0
               / CAST(z_scaled AS DOUBLE) AS raw
    FROM a
)
SELECT e.date, e.v_empty, e.z_scaled,
       CASE WHEN raw <= {2.5 * HLL_M!r} AND e.v_empty > 0
            THEN CAST(lc.lc_micro AS DOUBLE) / 1.0e6
            ELSE ROUND(raw, 6) END AS approx_count
FROM e LEFT JOIN lc ON lc.v_empty = e.v_empty
"""


@q("hll_distinct_users", _oracle_hll())
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-date approximate distinct users via the REPLAYABLE
    HyperLogLog (operators/frequency.py:hll_distinct) — the oracled
    sibling of rows-only `approx_distinct_users` (engine-private
    HLL++). Registers, the exact-integer harmonic sum, the raw
    IEEE-exact estimate, and the table-driven linear-counting branch
    are all replayed digit by digit in SQL; at the test scale every
    date takes the linear-counting branch (n ≈ 11-141 « 2.5m = 640),
    while the raw branch's bit-exactness is pinned by
    tests/test_round6_ops.py over synthetic high-cardinality groups.
    Scale: one corpus scan into a (date, bucket)-keyed aggregate ≤
    dates×256 rows after map-side combine — the same shuffle profile
    approx_count_distinct has, with none of its opacity."""
    from pyspark.sql import functions as F

    from ..operators.frequency import hll_distinct

    events = load_events(spark, sf_dir)
    return hll_distinct(
        events.withColumn("date", F.to_date("ts")), "user_id", ["date"]
    )


# ---------------------------------------------------------------------------
# Alternating-star connected components — the adversarial-topology
# clustering path gets its own hash-green driver row (the oracle is
# topology-blind: component = min reachable id, the same recursive-CTE
# closure dedup_clusters replays).
# ---------------------------------------------------------------------------

_ORACLE_DEDUP_CLUSTERS_STAR = f"""{_CC_CTES}
SELECT doc_id, component,
       COUNT(*) OVER (PARTITION BY component) AS cluster_size,
       CAST(doc_id = component AS BIGINT) AS keep
FROM alldocs
"""


@q("dedup_clusters_star", _ORACLE_DEDUP_CLUSTERS_STAR)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters with components computed by the alternating
    large-star/small-star algorithm (operators/clustering.py:
    connected_components_star, Kiveris et al. SoCC'14) instead of the
    cost-based union-find/label-propagation router — O(log n) rounds
    on ANY topology where label propagation needs O(diameter). Same
    semantics (component = min reachable doc_id), same oracle closure
    as `dedup_clusters`; a distinct driver row proves the
    adversarial-topology path end to end, not just in unit fuzz."""
    from ..operators.clustering import connected_components_star
    from ..operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "lang", threshold=0.8)
    comp = connected_components_star(pairs, src="id_a", dst="id_b")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("component")
    return (
        docs.select(F.col("doc_id"))
        .join(comp, F.col("doc_id") == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn(
            "keep",
            (F.col("doc_id") == F.col("component")).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM quality — continuation-count backoff, the
# canonical step past the Jelinek-Mercer interpolation
# (bigram_lm_quality). Discount D estimated from the data in-plan.
# ---------------------------------------------------------------------------


def _oracle_kn() -> str:
    from ..operators.text import kn_contrib_sql
    from .oracle_shared import _BUCKET

    return rf"""
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
ctx AS (
    SELECT prev, SUM(cb) AS cc, COUNT(*) AS n1v FROM lmb GROUP BY 1
),
cont AS (SELECT cur, COUNT(*) AS n1w FROM lmb GROUP BY 1),
vstat AS (
    SELECT COUNT(DISTINCT LOWER(t.tok)) AS v
    FROM b, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE bkt < 204
),
stats AS (
    SELECT COUNT(*) AS t_types,
           COALESCE(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END), 0) AS n1,
           COALESCE(SUM(CASE WHEN cb = 2 THEN 1 ELSE 0 END), 0) AS n2,
           v
    FROM lmb CROSS JOIN vstat
    GROUP BY v
),
sc AS (SELECT doc_id, prev, cur FROM bg WHERE bkt >= 230)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM({kn_contrib_sql()})
           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS avg_logprob
FROM sc
LEFT JOIN lmb USING (prev, cur)
LEFT JOIN ctx USING (prev)
LEFT JOIN cont USING (cur)
CROSS JOIN stats
GROUP BY 1
"""


@q("kn_bigram_quality", _oracle_kn())
def kn_bigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney bigram LM quality over the engine's own hash split
    (operators/text.py:kn_bigram_logprob_score): transitions trained
    on the train split score the test split, with the discount mass
    redistributed by CONTINUATION counts rather than raw frequency —
    the distinction that keeps gluey collocation tails ("francisco")
    from inflating unseen-context scores. D = n1/(n1+2·n2) estimated
    from the split's own count-of-counts in-plan; the per-transition
    term is ONE shared expression string (kn_contrib_sql) interpolated
    into both engines, so the arithmetic cannot drift."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import kn_bigram_logprob_score

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return kn_bigram_logprob_score(docs.filter(b >= 230), docs.filter(b < 204))


# ---------------------------------------------------------------------------
# C4-style blocklist gate — whole-token membership against a curated
# term list (Raffel et al. 2020 §2.2), the one famous page-drop rule
# the quality family didn't cover yet.
# ---------------------------------------------------------------------------

#: Stand-in curated list over the synthetic vocabulary — chosen so
#: both gate branches are live at every test sf ('slow'/'stale' are
#: mid-frequency corpus words; 'zzzz' pins the no-hit path for a term
#: absent from the corpus).
_BLOCKLIST = ["slow", "stale", "zzzz"]


def _oracle_blocklist() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(_BLOCKLIST))
    return rf"""
SELECT doc_id,
       CAST(GREATEST(LEN(LIST_INTERSECT(
           LIST_DISTINCT(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'),
                           x -> x <> ''),
               t -> LOWER(t))),
           [{terms}])), 0) AS BIGINT) AS n_blocked_terms,
       GREATEST(LEN(LIST_INTERSECT(
           LIST_DISTINCT(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'),
                           x -> x <> ''),
               t -> LOWER(t))),
           [{terms}])), 0) = 0 AS keep
FROM documents
"""


@q("blocklist_gate_docs", _oracle_blocklist())
def blocklist_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 blocklist page gate
    (operators/quality.py:blocklist_gate): drop any document whose
    WHOLE-TOKEN lowercased vocabulary intersects the curated list —
    token-exact matching avoids the classic substring false-positive
    bug. Map-only array_intersect against a literal term array: fully
    codegen, zero shuffles/joins — pure scan speed at 100 TB like the
    other quality gates. The oracle replays tokenize → distinct →
    intersect → count verbatim."""
    from pyspark.sql import functions as F

    from ..operators.quality import blocklist_gate

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_gate(docs, _BLOCKLIST).select(
        "doc_id", "n_blocked_terms", "keep"
    )


# ---------------------------------------------------------------------------
# Native session_window parity — Spark's built-in gap-session operator
# oracled against the classic gaps-and-islands SQL (the same sessions
# user_sessions derives via window functions).
# ---------------------------------------------------------------------------

_SW_GAP_MIN = 30

_ORACLE_SESSION_WINDOW = f"""
WITH m AS (
    SELECT user_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL {_SW_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts,
           SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM m
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_SW_GAP_MIN} MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@q("session_window_native", _ORACLE_SESSION_WINDOW)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window`` aggregate (dynamic gap
    sessions as a first-class grouping expression — the same operator
    Structured Streaming uses for stateful session aggregation) run in
    batch and oracled against the classic gaps-and-islands SQL: a
    session is a maximal event run with < {gap} min between
    neighbors, window end = last event + gap. Proving the native
    operator against the window-function formulation pins BOTH
    session derivations the engine offers (`user_sessions` is the
    islands form) to one semantics. Plan: one user-keyed shuffle into
    the session-window aggregate — no self-join, no window-then-
    groupBy double shuffle."""
    from pyspark.sql import functions as F

    events = load_events(spark, sf_dir)
    return (
        events.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(
            "user_id",
            F.session_window("ts", f"{_SW_GAP_MIN} minutes").alias("_w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# VariantType JSON (Spark 4) — parse once into the binary variant
# encoding, extract typed paths with variant_get. The modern
# replacement for per-path get_json_object string re-parsing
# (json_extract_agg is the string-path twin).
# ---------------------------------------------------------------------------

_ORACLE_VARIANT = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
       CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) > 50 THEN 1 END)
           AS BIGINT) AS n_high
FROM events
GROUP BY event_type
"""


@q("variant_json_agg", _ORACLE_VARIANT)
def variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: ``parse_json`` decodes each props
    payload ONCE into the binary variant encoding, then typed
    ``variant_get`` extractions feed integer aggregates —
    `json_extract_agg`'s modern twin (get_json_object re-parses the
    JSON string per path; variant parses once and served every
    extraction from the binary form, the 100 TB answer for
    multi-path semi-structured scans). Same hash-exact integer
    aggregate contract; DuckDB replays through its own JSON
    extraction."""
    from pyspark.sql import functions as F

    events = load_events(spark, sf_dir)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, F.lit(1))).alias("n_high"),
    )


# ---------------------------------------------------------------------------
# Containment near-dup pairs — the asymmetric dedup measure; the
# oracle is the NAIVE quadratic join, so every driver row re-proves
# the one-sided prefix filter's losslessness on real data.
# ---------------------------------------------------------------------------

_CONTAIN_TP, _CONTAIN_MIN = 600, 5

_ORACLE_CONTAINMENT = rf"""
WITH toks AS (
    SELECT doc_id, lang,
           LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) AS tok
    FROM documents
),
f AS (SELECT doc_id, lang, tok FROM toks WHERE LEN(tok) >= {_CONTAIN_MIN})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(LEN(LIST_INTERSECT(a.tok, b.tok)) AS DOUBLE)
           / LEN(a.tok) AS containment
FROM f a JOIN f b ON a.lang = b.lang AND a.doc_id <> b.doc_id
WHERE 1000 * LEN(LIST_INTERSECT(a.tok, b.tok)) >= {_CONTAIN_TP} * LEN(a.tok)
"""


@q("containment_pairs_docs", _ORACLE_CONTAINMENT)
def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs C(A→B) = |A∩B|/|A| ≥ 0.6, blocked
    by lang (operators/dedup.py:containment_pairs) — the asymmetric
    dedup measure that catches subset duplication symmetric Jaccard
    under-scores. Integer-exact permille gate; the Spark side runs the
    one-sided rarest-first prefix-filter join while the oracle runs
    the naive quadratic join, so the hash match doubles as an
    accelerator-equivalence proof."""
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs,
        "lang",
        threshold_permille=_CONTAIN_TP,
        min_tokens=_CONTAIN_MIN,
    )


# ---------------------------------------------------------------------------
# Leakage-safe k-fold assignment — cross-validation folds coined on
# the near-dup COMPONENT id (the leakage_safe_split contract extended
# from one split to k folds).
# ---------------------------------------------------------------------------

_KFOLD_K = 8  # must divide 256 (the md5 bucket space) — zero fold bias


def _oracle_kfold() -> str:
    h = "MD5('f|' || CAST(component AS VARCHAR))"
    b = (
        f"(INSTR('0123456789abcdef', SUBSTRING({h}, 1, 1)) - 1) * 16"
        f" + (INSTR('0123456789abcdef', SUBSTRING({h}, 2, 1)) - 1)"
    )
    return f"""{_CC_CTES}
SELECT doc_id, component,
       CAST(({b}) // {256 // _KFOLD_K} AS INT) AS fold
FROM alldocs
"""


@q("kfold_leakage_safe", _oracle_kfold())
def kfold_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment at CLUSTER granularity: the
    fold coin hashes the near-dup COMPONENT id ('f|'-salted — the
    purpose-salt rule: an unsalted coin would correlate with
    dataset_split's identity digest), so near-duplicate documents can
    never straddle folds — per-fold held-out evaluation stays
    contamination-free, the leakage_safe_split guarantee extended
    from one split to k=8 folds. k divides 256, so folds are exactly
    uniform over the bucket space. Cost beyond clustering: one
    map-side hash, no new shuffle."""
    from pyspark.sql import functions as F

    from ..operators.clustering import dedup_clusters_auto
    from ..operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup_clusters_auto(docs, "lang", "text", "doc_id", 0.8).select(
        "doc_id", "component"
    )
    return cc.withColumn(
        "fold", hash_bucket("component", buckets=_KFOLD_K, salt="f|")
    )


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer induction — merge-step mining over the
# distinct-word frequency table (operators/bpe.py), with the k-step
# loop replayed by DuckDB as chained CTEs whose per-step argmax feeds
# the next REPLACE through scalar subqueries.
# ---------------------------------------------------------------------------

_BPE_K = 6


def _bpe_cte_chain(
    k: int,
    scoring: str = "freq",
    docs_rel: str = "documents",
    with_kw: bool = True,
) -> str:
    """CTE chain w0, p1, b1, w1, ..., bk, wk replaying bpe_merges
    (``scoring='wordpiece'`` adds per-step symbol-count CTEs c{i} and
    the likelihood argmax — one BIGINT→DOUBLE IEEE division, which is
    correctly-rounded identically in JVM and DuckDB, unlike the
    transcendentals the HLL oracle had to precompute).

    Symbols are wrapped CHR(30) sym CHR(31); merge i is a plain
    literal REPLACE parameterized by the step's 1-row argmax b{i} via
    scalar subqueries — the SQL twin of the broadcast cross join."""
    wrap = r"REGEXP_REPLACE(word, '(.)', CHR(30) || '\1' || CHR(31), 'g')"
    parts = [
        f"""w0 AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq, {wrap} AS s
    FROM (
        SELECT REPLACE(REPLACE(t.word, CHR(30), ''), CHR(31), '') AS word
        FROM (SELECT UNNEST({_W}) AS word FROM {docs_rel}) t
    )
    WHERE word <> ''
    GROUP BY word
)"""
    ]
    for i in range(1, k + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
    SELECT s2.syms[s2.i] AS lhs, s2.syms[s2.i + 1] AS rhs,
           CAST(SUM(s2.freq) AS BIGINT) AS pair_count
    FROM (
        SELECT freq, syms, UNNEST(RANGE(2, LEN(syms))) AS i
        FROM (
            SELECT freq,
                   STRING_SPLIT(REPLACE(s, CHR(31), ''), CHR(30)) AS syms
            FROM {prev}
        )
    ) s2
    GROUP BY 1, 2
)"""
        )
        if scoring == "wordpiece":
            parts.append(
                f"""c{i} AS MATERIALIZED (
    SELECT s3.sym, CAST(SUM(s3.freq) AS BIGINT) AS sym_count
    FROM (
        SELECT freq, UNNEST(syms[2:LEN(syms)]) AS sym
        FROM (
            SELECT freq,
                   STRING_SPLIT(REPLACE(s, CHR(31), ''), CHR(30)) AS syms
            FROM {prev}
        )
    ) s3
    GROUP BY s3.sym
)"""
            )
            parts.append(
                f"""b{i} AS MATERIALIZED (
    SELECT p.lhs, p.rhs, p.pair_count
    FROM p{i} p
    JOIN c{i} cl ON cl.sym = p.lhs
    JOIN c{i} cr ON cr.sym = p.rhs
    ORDER BY CAST(p.pair_count AS DOUBLE)
             / (CAST(cl.sym_count AS DOUBLE) * CAST(cr.sym_count AS DOUBLE))
             DESC,
             p.pair_count DESC, p.lhs ASC, p.rhs ASC
    LIMIT 1
)"""
            )
        else:
            parts.append(
                f"""b{i} AS MATERIALIZED (
    SELECT lhs, rhs, pair_count FROM p{i}
    ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1
)"""
            )
        parts.append(
            f"""w{i} AS MATERIALIZED (
    SELECT word, freq,
           REPLACE(
               s,
               (SELECT CHR(30) || lhs || CHR(31) || CHR(30) || rhs || CHR(31)
                FROM b{i}),
               (SELECT CHR(30) || lhs || rhs || CHR(31) FROM b{i})
           ) AS s
    FROM {prev}
)"""
        )
    head = "WITH " if with_kw else ""
    return head + ",\n".join(parts)


def _oracle_bpe_merges() -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS step, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, _BPE_K + 1)
    )
    return f"{_bpe_cte_chain(_BPE_K)}\n{rows}"


def _oracle_bpe_token_lengths() -> str:
    return f"""{_bpe_cte_chain(_BPE_K)},
pw AS (
    SELECT word,
           CAST(LEN(s) - LEN(REPLACE(s, CHR(30), '')) AS BIGINT) AS w_tokens
    FROM w{_BPE_K}
),
dw AS (
    SELECT doc_id,
           REPLACE(REPLACE(t.word, CHR(30), ''), CHR(31), '') AS word
    FROM (SELECT doc_id, UNNEST({_W}) AS word FROM documents) t
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(pw.w_tokens) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN pw USING (word)
WHERE dw.word <> ''
GROUP BY doc_id
"""


@q("bpe_merge_steps", _oracle_bpe_merges())
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges mined from the documents corpus (Sennrich et
    al. 2016 training loop, vocabulary-compressed as real tokenizer
    trainers do): one corpus scan builds the distinct-word frequency
    table, then each step is one vocabulary-sized pair aggregate whose
    1-row argmax broadcasts into a map-side literal replace — the
    unrolled static plan never re-touches the corpus. Output is the
    trained merge table (step, lhs, rhs, pair_count), exact BIGINT."""
    from ..operators.bpe import bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges(docs, k=_BPE_K)[0]


@q("bpe_token_lengths", _oracle_bpe_token_lengths())
def bpe_token_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the 6-merge BPE tokenizer
    trained on the same corpus — the compression audit run before any
    tokenizer change: encode cost is ONE corpus scan equi-joined to
    the trained vocabulary (a word's token count is its open-marker
    count, already materialized by training)."""
    from ..operators.bpe import bpe_encode_lengths

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_lengths(docs, k=_BPE_K)


def _oracle_wordpiece_merges() -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS step, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, _BPE_K + 1)
    )
    return f"{_bpe_cte_chain(_BPE_K, scoring='wordpiece')}\n{rows}"


@q("wordpiece_merge_steps", _oracle_wordpiece_merges())
def wordpiece_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 WordPiece merges (Schuster & Nakajima 2012 likelihood
    rule) from the documents corpus: the same vocabulary-compressed
    loop as bpe_merge_steps, argmax by pair/(lhs·rhs) — per step, two
    extra vocabulary-sized joins against the symbol counts. The 'qu'
    contrast with BPE's 'er' first merge is the textbook behavior:
    likelihood scoring glues pairs that co-occur beyond chance rather
    than the globally most frequent pair."""
    from ..operators.bpe import wordpiece_merges

    docs = load_table(spark, sf_dir, "documents")
    return wordpiece_merges(docs, k=_BPE_K)[0]


# ---------------------------------------------------------------------------
# Per-source quality-score percentile calibration — the FineWeb/CCNet
# normalization step (raw quality signals are not comparable across
# sources; gates threshold each document's WITHIN-source percentile).
# ---------------------------------------------------------------------------


_ORACLE_SCORE_PCTL = r"""
WITH s AS (
    SELECT doc_id, source,
           (1000 * LEN(LIST_DISTINCT(toks))) // LEN(toks) AS score
    FROM (
        SELECT doc_id, source,
               REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+') AS toks
        FROM documents
    )
)
SELECT doc_id, source, score,
       CAST(CASE WHEN COUNT(*) OVER (PARTITION BY source) > 1
                 THEN (1000 * (RANK() OVER (PARTITION BY source
                                            ORDER BY score) - 1))
                      // (COUNT(*) OVER (PARTITION BY source) - 1)
                 ELSE 0 END AS BIGINT) AS pctl_permille
FROM s
"""


@q("quality_percentile_by_source", _ORACLE_SCORE_PCTL)
def quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile of the integer uniq-token-ratio score
    (operators/quality.py:score_percentiles). The oracle ranks with a
    plain window; the Spark side NEVER sorts document rows — scores
    aggregate to per-(source, score) counts (shuffle ∝ distinct
    values), the cumulative runs over that bounded relation, and the
    corpus joins back on (source, score): the aggregate-before-window
    pattern, so the hash match also proves the count-based rank
    arithmetic ≡ RANK()/PERCENT_RANK semantics."""
    from pyspark.sql import functions as F

    from ..operators.quality import score_percentiles

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "(1000 * size(array_distinct(split(lower(trim(text)),"
            " '\\\\s+')))) DIV size(split(lower(trim(text)), '\\\\s+'))"
        ).alias("score"),
    )
    return score_percentiles(scored, "score", "source", "doc_id")


def _oracle_bpe_fertility() -> str:
    return f"""{_bpe_cte_chain(_BPE_K)},
pw AS (
    SELECT word,
           CAST(LEN(s) - LEN(REPLACE(s, CHR(30), '')) AS BIGINT) AS w_tokens
    FROM w{_BPE_K}
),
dw AS (
    SELECT doc_id,
           REPLACE(REPLACE(t.word, CHR(30), ''), CHR(31), '') AS word
    FROM (SELECT doc_id, UNNEST({_W}) AS word FROM documents) t
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(pw.w_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST((1000 * CAST(SUM(pw.w_tokens) AS BIGINT)) // COUNT(*)
            AS BIGINT) AS fertility_permille
FROM dw JOIN pw USING (word) JOIN documents d USING (doc_id)
WHERE dw.word <> ''
GROUP BY d.lang
"""


@q("bpe_fertility_by_lang", _oracle_bpe_fertility())
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE tokens per word, permille) by
    language under the corpus-trained 6-merge tokenizer — the
    standard tokenizer-equity audit: a merge inventory dominated by
    one language's morphology inflates every other language's token
    budget (the imbalance UniMax allocation then has to pay for).
    Exact integers end to end: Σtokens and Σwords aggregate
    exactly; fertility is one integer DIV at permille scale. Cost on
    top of the training chain: the same encode join as
    bpe_token_lengths plus a lang-keyed aggregate."""
    from pyspark.sql import functions as F

    from ..operators.bpe import bpe_encode_lengths

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_lengths(docs, k=_BPE_K)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility_permille",
            F.expr("(1000 * n_bpe_tokens) DIV n_words"),
        )
    )


# ---------------------------------------------------------------------------
# Oracled bucket-cap drop stats — the md5-seeded sibling of rows-only
# minhash_drop_stats (the ann_lsh_oracle pattern applied to the LAST
# observability side-output without a replayable twin): same counter
# arithmetic, engine-portable hash family, so DuckDB replays the
# bucket-size relation and the three counters hash-check exactly.
# ---------------------------------------------------------------------------

_DROP_CAP = 2  # tight so the cap bites at gate scale factors


def _oracle_minhash_drop_stats() -> str:
    from .driver_queries import _MINHASH_CTES

    return f"""{_MINHASH_CTES},
bs AS (
    SELECT band_id, band_hash, CAST(COUNT(*) AS BIGINT) AS c
    FROM banded GROUP BY band_id, band_hash
)
SELECT CAST(COUNT(*) AS BIGINT) AS dropped_buckets,
       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dropped_rows,
       CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)
           AS dropped_candidate_pairs
FROM bs WHERE c > {_DROP_CAP}
"""


@q("minhash_drop_stats_oracle", _oracle_minhash_drop_stats())
def minhash_drop_stats_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH bucket-cap observability counters under the md5-seeded
    hash family (driver_queries._md5_banded — the same 8×4 banding
    minhash_lsh_oracle replays): dropped_buckets / dropped_rows /
    dropped_candidate_pairs for max_bucket=2, Σ c·(c−1)/2 over
    over-cap buckets. The production operator's counters
    (minhash_drop_stats, xxhash-seeded, rows-only by necessity) use
    the IDENTICAL aggregate over its own bucket relation — this
    sibling pins that arithmetic against SQL, closing the last
    observability output without a replayable twin."""
    from pyspark.sql import functions as F

    from .driver_queries import _md5_banded

    docs = load_table(spark, sf_dir, "documents")
    banded = _md5_banded(docs)[1]
    bs = banded.groupBy("band_id", "band_hash").agg(
        F.count("*").cast("long").alias("c")
    )
    over = bs.filter(F.col("c") > _DROP_CAP)
    return over.agg(
        F.count("*").cast("long").alias("dropped_buckets"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("dropped_rows"),
        F.coalesce(
            F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0)
        )
        .cast("long")
        .alias("dropped_candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# Curated tokenizer — BPE trained on the CURATION OUTPUT (the demo's
# closing step, now oracled): dedup → representatives → gate →
# leakage-safe split → train-split-only merge mining, the full
# "curate, then induce the subword inventory from what you actually
# train on" recipe in one SQL-replayed plan.
# ---------------------------------------------------------------------------


def _oracle_curated_bpe() -> str:
    chain = _bpe_cte_chain(_BPE_K, docs_rel="traindocs", with_kw=False)
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS step, lhs, rhs, pair_count FROM b{i}"
        for i in range(1, _BPE_K + 1)
    )
    return f"""{_curation_sp_ctes()},
traindocs AS MATERIALIZED (
    SELECT d.doc_id, d.text
    FROM documents d JOIN sp ON sp.doc_id = d.doc_id
    WHERE sp.split = 'train'
),
{chain}
{rows}"""


@q("curated_bpe_merges", _oracle_curated_bpe())
def curated_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges trained on the CURATED train split — the
    composition the curation demo closes with, now hash-pinned: the
    tokenizer's subword inventory must come from post-dedup,
    post-gate, train-only text (a held-out split leaking into merge
    mining is subword-level contamination; boilerplate surviving
    dedup would dominate the pair counts). One plan: curation_recipe
    (clustering subtree shared via its localCheckpoint) → train-split
    doc ids → the vocabulary-compressed merge loop. The oracle splices
    the recipe chain through `sp` into the BPE CTE chain — two proven
    closures composed, pinning the handoff contract."""
    from pyspark.sql import functions as F

    from ..operators.bpe import bpe_merges
    from ..operators.curation import curation_recipe

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    recipe = curation_recipe(
        docs,
        _E2E_BUDGET,
        _E2E_EPOCHS,
        jaccard_threshold=0.8,
        min_tokens=_E2E_MIN_TOKENS,
        min_uniq_permille=_E2E_MIN_UNIQ_PM,
    )
    train = docs.join(
        recipe.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    return bpe_merges(train, k=_BPE_K)[0]


# ---------------------------------------------------------------------------
# Curation funnel audit — per-language doc counts at every recipe
# stage (input → dedup representatives → quality gate → each split).
# The ops dashboard that tells a pipeline where each language's mass
# went; at 100 TB every stage count is a grouped aggregate over
# relations the recipe already builds.
# ---------------------------------------------------------------------------


def _oracle_curation_funnel() -> str:
    return f"""{_curation_sp_ctes()}
SELECT stage, lang, CAST(n_docs AS BIGINT) AS n_docs FROM (
    SELECT '1_input' AS stage, lang, COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    UNION ALL
    SELECT '2_dedup_rep', d.lang, COUNT(*)
    FROM reps r JOIN documents d ON d.doc_id = r.doc_id GROUP BY d.lang
    UNION ALL
    SELECT '3_gated', lang, COUNT(*) FROM gated GROUP BY lang
    UNION ALL
    SELECT '4_' || split, lang, COUNT(*) FROM sp GROUP BY split, lang
)
"""


@q("curation_funnel_by_lang", _oracle_curation_funnel())
def curation_funnel_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document counts through every curation stage:
    input corpus → near-dup representatives → quality-gate survivors
    → train/val/test. Shares the recipe's stage definitions through
    operators/curation.py:curation_split (the funnel and the recipe
    can't drift apart), so the oracle row for this query pins WHERE
    each language's mass went, not just what survived — the audit
    that catches a gate silently wiping out one language. All stages
    are grouped aggregates over relations the recipe already builds;
    the clustering subtree runs once (curation_split's input)."""
    from pyspark.sql import functions as F

    from ..operators.clustering import dedup_clusters_auto
    from ..operators.curation import curation_split

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    cc = (
        dedup_clusters_auto(docs, "lang", "text", "doc_id", 0.8)
        .select("doc_id", "component")
        .localCheckpoint(eager=False)  # two consumers: split + reps
    )
    split = curation_split(
        docs,
        cc,
        min_tokens=_E2E_MIN_TOKENS,
        min_uniq_permille=_E2E_MIN_UNIQ_PM,
    ).localCheckpoint(eager=False)

    def _count(df, stage):
        return df.groupBy("lang").agg(
            F.count("*").cast("long").alias("n_docs")
        ).select(F.lit(stage).alias("stage"), "lang", "n_docs")

    input_c = _count(docs, "1_input")
    # representatives = one survivor per component, pre-gate: split's
    # parent before the gate isn't exposed — recompute the rep set
    # from the same clustering (cheap: reps ≤ components)
    from ..operators.clustering import cluster_representatives

    cc_full = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    reps = cluster_representatives(docs, cc_full)
    rep_c = _count(
        docs.join(reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id"),
        "2_dedup_rep",
    )
    gate_c = _count(split, "3_gated")
    split_c = (
        split.groupBy("split", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            F.concat(F.lit("4_"), F.col("split")).alias("stage"),
            "lang",
            "n_docs",
        )
    )
    return input_c.unionAll(rep_c).unionAll(gate_c).unionAll(split_c)


# ---------------------------------------------------------------------------
# Chi-square keyness — distinctive vocabulary per language vs. the
# rest of the corpus (the corpus-linguistics audit that catches a
# source drifting off-distribution BEFORE training on it).
# ---------------------------------------------------------------------------

_KEYNESS_K, _KEYNESS_MIN = 10, 5


def _oracle_chi2_keyness() -> str:
    from ..operators.text import CHI2_OVERREP_SQL, chi2_milli_sql

    return rf"""
WITH tok AS (
    SELECT d.lang AS g, LOWER(t.tok) AS token
    FROM documents d,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE d.lang IS NOT NULL
),
counts AS (
    SELECT g, token, CAST(COUNT(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2
),
tt AS (SELECT token, CAST(SUM(a) AS BIGINT) AS t_tot FROM counts GROUP BY 1),
gt AS (SELECT g, CAST(SUM(a) AS BIGINT) AS g_tot FROM counts GROUP BY 1),
n AS (SELECT CAST(SUM(a) AS BIGINT) AS tot FROM counts),
f AS (
    SELECT x.g, x.token, x.a AS a,
           tt.t_tot - x.a AS b,
           gt.g_tot - x.a AS c,
           n.tot - tt.t_tot - gt.g_tot + x.a AS d
    FROM counts x JOIN tt USING (token) JOIN gt USING (g) CROSS JOIN n
),
scored AS (
    SELECT g, token, a, {chi2_milli_sql()} AS chi2_milli
    FROM f
    WHERE a >= {_KEYNESS_MIN} AND ({CHI2_OVERREP_SQL})
)
SELECT g AS lang, token, a AS n_in_group, chi2_milli,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY g ORDER BY chi2_milli DESC, token ASC
       ) AS INT) AS rk
FROM scored
QUALIFY rk <= {_KEYNESS_K}
"""


@q("chi2_keyness_by_lang", _oracle_chi2_keyness())
def chi2_keyness_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 chi-square keyness terms per language
    (operators/text.py:chi2_keyness): for each (lang, token) the 2x2
    contingency table against the rest of the corpus, overrepresented
    terms only, ranked by the milli-scaled BIGINT statistic so the
    cross-engine ordering is ulp-proof. The chi-square arithmetic is
    ONE shared expression string (chi2_milli_sql) interpolated into
    both engines — pure rational IEEE ops, no POWER/LN. One corpus
    scan: token/group/global totals all derive from the (lang, token)
    count relation, whose exchange AQE reuses."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.text import chi2_keyness

    return chi2_keyness(
        docs, group_col="lang", k=_KEYNESS_K, min_count=_KEYNESS_MIN
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the quantization family's other workhorse
# next to PQ (FAISS IndexScalarQuantizer QT_8bit): per-dimension
# affine 8-bit grid from corpus min/max, no codebook training. Codes,
# symmetric top-k, and recall-vs-exact, each fully SQL-replayed via
# the SAME dialect-shared expression generators the Spark side uses.
# ---------------------------------------------------------------------------

_SQ_DIMS = 64


def _sq_oracle_ctes() -> str:
    from ..operators.similarity import sq_recon_scaled_sql

    mm_cols = ", ".join(
        f"MIN(CAST(embedding[{i + 1}] AS DOUBLE)) AS mn{i},"
        f" MAX(CAST(embedding[{i + 1}] AS DOUBLE)) AS mx{i}"
        for i in range(_SQ_DIMS)
    )
    st_cols = ", ".join(
        f"(mx{i} - mn{i}) / 256.0 AS st{i}" for i in range(_SQ_DIMS)
    )
    recon = ", ".join(
        sq_recon_scaled_sql(f"e.embedding[{i + 1}]", f"st.mn{i}", f"st.st{i}")
        for i in range(_SQ_DIMS)
    )
    return f"""
mm AS (
    SELECT {mm_cols}
    FROM embeddings WHERE LEN(embedding) = {_SQ_DIMS}
),
st AS (SELECT *, {st_cols} FROM mm),
recon AS (
    SELECT e.vec_id, [{recon}] AS r
    FROM embeddings e CROSS JOIN st
    WHERE LEN(e.embedding) = {_SQ_DIMS}
)"""


def _oracle_sq_codes() -> str:
    from ..operators.similarity import sq_code_sql

    mm_cols = ", ".join(
        f"MIN(CAST(embedding[{i + 1}] AS DOUBLE)) AS mn{i},"
        f" MAX(CAST(embedding[{i + 1}] AS DOUBLE)) AS mx{i}"
        for i in range(_SQ_DIMS)
    )
    st_cols = ", ".join(
        f"(mx{i} - mn{i}) / 256.0 AS st{i}" for i in range(_SQ_DIMS)
    )
    codes = ", ".join(
        sq_code_sql(f"e.embedding[{i + 1}]", f"st.mn{i}", f"st.st{i}")
        for i in range(_SQ_DIMS)
    )
    return f"""
WITH mm AS (
    SELECT {mm_cols}
    FROM embeddings WHERE LEN(embedding) = {_SQ_DIMS}
),
st AS (SELECT *, {st_cols} FROM mm)
SELECT e.vec_id AS id,
       ARRAY_TO_STRING(
           LIST_TRANSFORM([{codes}], x -> CAST(x AS VARCHAR)), ','
       ) AS sq_code
FROM embeddings e CROSS JOIN st
WHERE LEN(e.embedding) = {_SQ_DIMS}
"""


@q("sq8_codes", _oracle_sq_codes())
def sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization encoding (operators/similarity.py:
    sq_encode): each 64-dim float32 vector becomes 64 one-byte codes
    on a per-dimension affine grid derived from corpus min/max — 4×
    smaller than float32 with NO codebook training (the quantizer is
    192 doubles folded into the plan as literals). The oracle
    re-derives the grid from its own MIN/MAX aggregate and replays
    the clamp/floor arithmetic through the SAME dialect-shared
    expression string (sq_code_sql), so Spark's collected literals
    are pinned bit-exact against SQL-computed parameters. Map-only
    encode scan; the 1-row params aggregate is the only other job."""
    from ..operators.similarity import sq_encode, sq_params

    emb = load_table(spark, sf_dir, "embeddings")
    mins, _maxs, steps = sq_params(emb, dims=_SQ_DIMS)
    return sq_encode(emb, mins, steps)


def _oracle_sq_topk() -> str:
    return f"""
WITH {_sq_oracle_ctes()},
qr AS (SELECT vec_id AS query_id, r AS q FROM recon WHERE vec_id < 5),
scored AS (
    SELECT qr.query_id, c.vec_id AS doc_id,
           CAST(LIST_SUM(LIST_TRANSFORM(
               RANGE(1, {_SQ_DIMS + 1}),
               i -> (qr.q[i] - c.r[i]) * (qr.q[i] - c.r[i])
           )) AS BIGINT) AS d
    FROM recon c CROSS JOIN qr
)
SELECT query_id, rank, doc_id, d2 FROM (
    SELECT query_id, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank,
           CAST(d AS DOUBLE) / 1000000000000.0 AS d2
    FROM scored
)
WHERE rank <= 10
"""


@q("sq8_topk_sym", _oracle_sq_topk())
def sq8_topk_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric SQ8 L2 top-10 (operators/similarity.py:sq_topk):
    both sides reconstruct onto the 8-bit grid as 1e6-scaled BIGINTs
    and the distance is the exact integer Σ(qr−cr)² — order-free, so
    no partition layout can flip a rank. Corpus side is one map-only
    scan (at scale: a decode of the stored 64-byte codes); queries
    broadcast; per-query ranking is the l2_topk window."""
    from pyspark.sql import functions as F

    from ..operators.similarity import sq_params, sq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    mins, _maxs, steps = sq_params(emb, dims=_SQ_DIMS)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq_topk(emb, queries, mins, steps, k=10)


def _sq_l2_sql(q: str, v: str) -> str:
    return " + ".join(
        f"POWER(CAST({q}[{i + 1}] AS DOUBLE) - CAST({v}[{i + 1}] AS DOUBLE), 2)"
        for i in range(_SQ_DIMS)
    )


def _oracle_sq_recall() -> str:
    return f"""
WITH {_sq_oracle_ctes()},
qr AS (SELECT vec_id AS query_id, r AS q FROM recon WHERE vec_id < 5),
approx AS (
    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT qr.query_id, c.vec_id AS doc_id,
               CAST(LIST_SUM(LIST_TRANSFORM(
                   RANGE(1, {_SQ_DIMS + 1}),
                   i -> (qr.q[i] - c.r[i]) * (qr.q[i] - c.r[i])
               )) AS BIGINT) AS d
        FROM recon c CROSS JOIN qr
    )
),
exact AS (
    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY d ASC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
               CAST(ROUND(({_sq_l2_sql('q.embedding', 'e.embedding')}) * 1e9)
                    AS BIGINT) AS d
        FROM embeddings e
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id < 5) q
        WHERE LEN(e.embedding) = {_SQ_DIMS}
          AND LEN(q.embedding) = {_SQ_DIMS}
    )
)
SELECT (SELECT COUNT(DISTINCT query_id) FROM exact WHERE rank <= 10)
           AS n_queries,
       10 AS k,
       (SELECT COUNT(*) FROM exact WHERE rank <= 10) AS n_exact,
       (SELECT COUNT(*) FROM exact e
        JOIN approx a ON e.query_id = a.query_id AND e.doc_id = a.doc_id
        WHERE e.rank <= 10 AND a.rank <= 10) AS n_hits
"""


@q("sq8_recall", _oracle_sq_recall())
def sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of symmetric SQ8 against exact brute-force L2 as a
    one-row in-engine reduction — the pq_recall pattern for the
    scalar quantizer: the oracle replays BOTH sides (grid derivation,
    reconstruction, integer symmetric distance, exact L2), so the
    recall number is deterministic and driver-hashed rather than a
    pinned threshold."""
    from pyspark.sql import functions as F

    from ..operators.similarity import l2_topk, sq_params, sq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    mins, _maxs, steps = sq_params(emb, dims=_SQ_DIMS)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sq_topk(emb, queries, mins, steps, k=10)
    exact = l2_topk(emb, queries, k=10, dims=_SQ_DIMS)
    hits = exact.join(
        approx.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select("n_queries", F.lit(10).alias("k"), "n_exact", "n_hits")
    )


# ---------------------------------------------------------------------------
# Source-level corpus overlap from MinHash signature unions — the
# sketch-algebra trick (sig(A ∪ B) = elementwise-min) turned into the
# corpus-composition audit, with the exact Jaccard twin in the same
# row so every driver run re-measures the estimator against truth.
# ---------------------------------------------------------------------------


def _oracle_source_overlap() -> str:
    from .driver_queries import _MH_HASHES, _md5int16_sql

    sig_cols = ", ".join(
        f"MIN({_md5int16_sql('s', i)}) AS h{i}" for i in range(_MH_HASHES)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
        for i in range(_MH_HASHES)
    )
    return rf"""
WITH t AS (
    SELECT source AS g, REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+') AS w
    FROM documents
    WHERE LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) >= 3
),
dsh AS (
    SELECT DISTINCT g, ARRAY_TO_STRING(w[i:i+2], ' ') AS s
    FROM t, UNNEST(RANGE(1, LEN(w) - 1)) AS r(i)
),
sig AS (SELECT g, {sig_cols} FROM dsh GROUP BY g),
sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sh FROM dsh GROUP BY g),
common AS (
    SELECT a.g AS g_a, b.g AS g_b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM dsh a JOIN dsh b ON a.s = b.s AND a.g < b.g
    GROUP BY 1, 2
),
m AS (
    SELECT p.g_a, p.g_b, p.n_sh_a, p.n_sh_b,
           CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
           CAST({matches} AS BIGINT) AS est_matches
    FROM (SELECT a.g AS g_a, a.n_sh AS n_sh_a, b.g AS g_b, b.n_sh AS n_sh_b
          FROM sizes a JOIN sizes b ON a.g < b.g) p
    LEFT JOIN common c ON c.g_a = p.g_a AND c.g_b = p.g_b
    JOIN sig sa ON sa.g = p.g_a
    JOIN sig sb ON sb.g = p.g_b
)
SELECT g_a, g_b, n_sh_a, n_sh_b, n_common,
       CAST((1000 * n_common) // (n_sh_a + n_sh_b - n_common) AS BIGINT)
           AS exact_permille,
       est_matches,
       CAST((1000 * est_matches) // {_MH_HASHES} AS BIGINT) AS est_permille
FROM m
"""


@q("source_overlap_minhash", _oracle_source_overlap())
def source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level shingle overlap estimated from MinHash
    signature UNIONS (operators/dedup.py:group_minhash_overlap, run
    here with the md5-portable hash family minhash_lsh_oracle
    established): sig(A ∪ B) is the elementwise MIN of member
    signatures, so each source's signature is one (source)-keyed MIN
    aggregate — groups × 8 rows after map-side combine — and
    J(A, B) ≈ matching components / 8. The same row carries the exact
    distinct-shingle Jaccard (shingle-keyed equi-join), so the driver
    hash re-audits the estimator against ground truth every round;
    at 100 TB the exact twin is the part you drop and the sketch is
    the plan that survives."""
    from .driver_queries import _MH_HASHES, _md5int16_col

    docs = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import group_minhash_overlap

    hash_fns = [
        (lambda c, i=i: _md5int16_col(c, i)) for i in range(_MH_HASHES)
    ]
    return group_minhash_overlap(
        docs, group_col="source", shingle_k=3, hash_fns=hash_fns
    )


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov drift — the nonparametric sibling of the PSI
# audit: no binning choice, no smoothing constant, exact integer
# arithmetic end to end.
# ---------------------------------------------------------------------------

_ORACLE_KS = """
WITH cnts AS (
    SELECT source AS g, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c_g
    FROM documents
    WHERE source IS NOT NULL AND n_chars IS NOT NULL
    GROUP BY 1, 2
),
allv AS (SELECT v, CAST(SUM(c_g) AS BIGINT) AS c_all FROM cnts GROUP BY 1),
groups AS (SELECT g, CAST(SUM(c_g) AS BIGINT) AS n_g FROM cnts GROUP BY 1),
total AS (SELECT CAST(SUM(c_g) AS BIGINT) AS n_total FROM cnts),
grid AS (
    SELECT s.g, s.v, s.n_g, s.n_total - s.n_g AS n_rest,
           COALESCE(c.c_g, 0) AS c_g,
           s.c_all - COALESCE(c.c_g, 0) AS c_rest
    FROM (SELECT a.v, a.c_all, gr.g, gr.n_g, t.n_total
          FROM allv a CROSS JOIN groups gr CROSS JOIN total t) s
    LEFT JOIN cnts c ON c.g = s.g AND c.v = s.v
),
scored AS (
    SELECT g, n_g, n_rest,
           ABS(SUM(c_g) OVER w * n_rest - SUM(c_rest) OVER w * n_g) AS num
    FROM grid
    WINDOW w AS (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT g AS source, n_g, n_rest,
       CAST(MAX(num) AS BIGINT) AS ks_num,
       CAST((1000 * MAX(num)) // (n_g * n_rest) AS BIGINT) AS ks_permille
FROM scored
GROUP BY g, n_g, n_rest
"""


@q("ks_drift_by_source", _ORACLE_KS)
def ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift of the document-length
    distribution, each source vs the rest of the corpus
    (operators/drift.py:ks_drift) — the nonparametric sibling of
    `source_drift_psi`: no bin edges to pick, no smoothing constant,
    and the statistic is EXACT — the CDF gap is kept as the
    cross-multiplied integer numerator |cum_g·n_rest − cum_rest·n_g|,
    divided only once into the final permille. The cumulative windows
    run over the |sources| × |distinct lengths| grid (the quantiles
    aggregate-before-window rule), never document rows."""
    from ..operators.drift import ks_drift

    docs = load_table(spark, sf_dir, "documents")
    return ks_drift(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# n-gram novelty — the inverse view of decontamination: how much of
# each held-out document is text the training corpus has never seen.
# ---------------------------------------------------------------------------

_ORACLE_NOVELTY = f"""
WITH b AS (
    SELECT doc_id, text, {{bucket}} AS bkt FROM documents
),
g AS (
    SELECT doc_id, bkt,
           LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, LEN({{w}}) - 3),
               i -> ARRAY_TO_STRING(({{w}})[i : i + 4], ' ')
           )) AS grams
    FROM b WHERE LEN({{w}}) >= 5
),
tg AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE bkt < 204),
sg AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE bkt >= 230),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM sg GROUP BY 1),
seen AS (
    SELECT sg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
    FROM sg JOIN tg USING (gram) GROUP BY 1
)
SELECT t.doc_id, t.n_grams,
       CAST(COALESCE(s.n_seen, 0) AS BIGINT) AS n_seen,
       CAST((1000 * (t.n_grams - COALESCE(s.n_seen, 0))) // t.n_grams
            AS BIGINT) AS novelty_permille
FROM tot t LEFT JOIN seen s USING (doc_id)
"""


def _oracle_novelty() -> str:
    from .oracle_shared import _BUCKET, _W

    return _ORACLE_NOVELTY.format(bucket=_BUCKET, w=_W)


@q("ngram_novelty_scores", _oracle_novelty())
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty of the test split against the train
    split (operators/text.py:ngram_novelty) — the inverse view of
    `ngram_decontamination`: the permille of each held-out document's
    distinct 5-grams that appear nowhere in training text (the
    memorization-audit statistic). Train side collapses to its
    distinct gram inventory before the gram-keyed join (smaller
    shuffle than the decontamination postings — no train doc
    identity); exact integer permille."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import ngram_novelty

    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return ngram_novelty(docs.filter(b < 204), docs.filter(b >= 230), n=5)


# ---------------------------------------------------------------------------
# Embedding-space outlier gate — the SSL-prefilter curation step
# (distance-to-assigned-centroid percentile pruning, per cell).
# ---------------------------------------------------------------------------

_GATE_CELLS, _GATE_KEEP = 8, 900


def _oracle_outlier_gate() -> str:
    from .driver_queries import cos_sql

    d2 = " + ".join(
        f"POWER(CAST(e.embedding[{i + 1}] AS DOUBLE)"
        f" - CAST(s.cv[{i + 1}] AS DOUBLE), 2)"
        for i in range(_SQ_DIMS)
    )
    return f"""
WITH seeds AS (
    SELECT embedding AS cv,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR))) AS INTEGER) - 1 AS cid
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_GATE_CELLS}
),
cells AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {cos_sql('e.embedding', 's.cv')} DESC,
                            s.cid ASC) AS rn
        FROM embeddings e CROSS JOIN seeds s
        WHERE LEN(e.embedding) = {_SQ_DIMS}
    ) WHERE rn = 1
),
d AS (
    SELECT c.vec_id, c.cid AS centroid_id,
           CAST(ROUND(({d2}) * 1e9) AS BIGINT) AS d2_scaled
    FROM cells c
    JOIN embeddings e ON e.vec_id = c.vec_id
    JOIN seeds s ON s.cid = c.cid
),
p AS (
    SELECT vec_id, centroid_id, d2_scaled,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY centroid_id) > 1
                     THEN (1000 * (RANK() OVER (
                               PARTITION BY centroid_id
                               ORDER BY d2_scaled) - 1))
                          // (COUNT(*) OVER (PARTITION BY centroid_id) - 1)
                     ELSE 0 END AS BIGINT) AS pctl_permille
    FROM d
)
SELECT vec_id, centroid_id, d2_scaled, pctl_permille,
       pctl_permille <= {_GATE_KEEP} AS keep
FROM p
"""


@q("embedding_outlier_gate", _oracle_outlier_gate())
def embedding_outlier_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning (operators/similarity.py:
    embedding_outlier_gate — the DataComp/D4-style SSL prefilter run
    ahead of SemDeDup): assign to the md5-seed codebook
    (assign_centroid's dot/|c| argmax, oracle-ranked by full cosine —
    the proven equivalence), score by 1e9-scaled BIGINT L2² to the
    assigned centroid, drop the farthest 10% WITHIN each cell
    (per-cell percentile via the aggregate-before-window
    score_percentiles, because cell radii differ). Everything the
    driver hashes — assignment, distance, percentile, keep — is
    integer-exact."""
    from ..operators.similarity import (
        embedding_outlier_gate,
        seed_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = seed_vectors(emb, _GATE_CELLS)
    return embedding_outlier_gate(emb, cents, keep_permille=_GATE_KEEP)


# ---------------------------------------------------------------------------
# HLL register algebra — pairwise distinct-token overlap between
# sources via bucket-wise-MAX union sketches + inclusion–exclusion
# (the cardinality complement of source_overlap_minhash's Jaccard).
# ---------------------------------------------------------------------------


def _hll_digit(h: str, i: int) -> str:
    return f"(INSTR('0123456789abcdef', SUBSTRING({h}, {i}, 1)) - 1)"


def _hll_w_sql(h: str) -> str:
    return " + ".join(
        f"CAST({_hll_digit(h, i + 3)} AS BIGINT) * {16 ** (11 - i)}"
        if i < 11
        else f"CAST({_hll_digit(h, 14)} AS BIGINT)"
        for i in range(12)
    )


def _hll_est_ctes(prefix: str, regs: str, gcols: str) -> str:
    """The hll_estimate arithmetic replay over a register relation —
    agg / raw / linear-counting CTE triple, parameterized by group
    columns (the same digit-for-digit chain the hll_distinct_users
    oracle pinned)."""
    from ..operators.frequency import HLL_ALPHA_SQL, HLL_M, HLL_Z_ONE

    return f"""{prefix}a AS (
    SELECT {gcols}, CAST({HLL_M} - COUNT(*) AS INT) AS v_empty,
           CAST(SUM(CAST(1 AS BIGINT) << (49 - rho_max))
                + ({HLL_M} - COUNT(*)) * {HLL_Z_ONE} AS BIGINT) AS z_scaled
    FROM {regs} GROUP BY {gcols}
),
{prefix}e AS (
    SELECT {gcols}, v_empty,
           {HLL_ALPHA_SQL} * 65536.0 * 562949953421312.0
               / CAST(z_scaled AS DOUBLE) AS raw
    FROM {prefix}a
),
{prefix}est AS (
    SELECT {gcols},
           CASE WHEN raw <= {2.5 * HLL_M!r} AND x.v_empty > 0
                THEN CAST(lc.lc_micro AS DOUBLE) / 1.0e6
                ELSE ROUND(raw, 6) END AS approx_count
    FROM {prefix}e x LEFT JOIN lc ON lc.v_empty = x.v_empty
)"""


def _oracle_hll_overlap() -> str:
    from ..operators.frequency import hll_lc_micro_table

    h = "MD5('hll|' || token)"
    lc_rows = ", ".join(f"({v}, {m})" for v, m in hll_lc_micro_table())
    return rf"""
WITH lc(v_empty, lc_micro) AS (VALUES {lc_rows}),
tok AS (
    SELECT d.source AS g, LOWER(t.tok) AS token
    FROM documents d,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
    WHERE d.source IS NOT NULL
),
k AS (
    SELECT g, {_hll_digit(h, 1)} * 16 + {_hll_digit(h, 2)} AS bucket,
           {_hll_w_sql(h)} AS w
    FROM tok
),
regs AS (
    SELECT g, bucket,
           MAX(CASE WHEN w = 0 THEN 49
                    ELSE 49 - LENGTH(BIN(w)) END) AS rho_max
    FROM k GROUP BY g, bucket
),
{_hll_est_ctes('g', 'regs', 'g')},
pairs AS (
    SELECT a.g AS g_a, b.g AS g_b
    FROM (SELECT DISTINCT g FROM regs) a
    JOIN (SELECT DISTINCT g FROM regs) b ON a.g < b.g
),
ur AS (
    SELECT g_a, g_b, bucket, MAX(rho_max) AS rho_max FROM (
        SELECT p.g_a, p.g_b, r.bucket, r.rho_max
        FROM pairs p JOIN regs r ON r.g = p.g_a
        UNION ALL
        SELECT p.g_a, p.g_b, r.bucket, r.rho_max
        FROM pairs p JOIN regs r ON r.g = p.g_b
    ) GROUP BY 1, 2, 3
),
{_hll_est_ctes('u', 'ur', 'g_a, g_b')}
SELECT u.g_a, u.g_b,
       ea.approx_count AS est_a,
       eb.approx_count AS est_b,
       u.approx_count AS est_union,
       (ea.approx_count + eb.approx_count) - u.approx_count
           AS est_intersection
FROM uest u
JOIN gest ea ON ea.g = u.g_a
JOIN gest eb ON eb.g = u.g_b
"""


@q("source_token_overlap_hll", _oracle_hll_overlap())
def source_token_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-TOKEN overlap between sources via HLL
    register algebra (operators/frequency.py:hll_group_overlap):
    registers are max-mergeable, so each pair's union sketch is the
    bucket-wise MAX of its members' registers — |A|, |B|, |A∪B| from
    the same 256-register relation, |A∩B| by inclusion–exclusion, no
    second corpus scan. The cardinality complement of
    `source_overlap_minhash` (which estimates Jaccard from
    signature-component matches). The oracle replays registers, the
    exact-integer harmonic sums, the linear-counting table, and the
    pair-union MAX digit for digit — the hll_distinct_users machinery
    generalized to sketch UNION."""
    from pyspark.sql import functions as F

    from ..operators.frequency import hll_group_overlap
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.filter(F.col("source").isNotNull()).select(
        "source", F.explode(F.transform(tokens("text"), F.lower)).alias("token")
    )
    return hll_group_overlap(tok, "source", "token")


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs — the bag-of-words similarity join
# completing the triad: dense embedding cosine, set Jaccard, and now
# weighted sparse cosine, all blocked, all exact-integer-ranked.
# ---------------------------------------------------------------------------

_TC_THRESH, _TC_MAXDF_PM = 600, 100

_ORACLE_TFIDF_COS = rf"""
WITH tok AS (
    SELECT d.doc_id, d.lang, LOWER(t.tok) AS token
    FROM documents d,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS t(tok)
),
tf AS (
    SELECT doc_id, lang, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY 1, 2, 3
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
dfq AS (
    SELECT token, df FROM (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ) CROSS JOIN n
    WHERE 1000 * df <= {_TC_MAXDF_PM} * n_docs
),
w AS (
    SELECT tf.doc_id, tf.lang, tf.token,
           tf.tf * CAST(ROUND(LN(CAST(n.n_docs AS DOUBLE) / df) * 1e3)
                        AS BIGINT) AS wt
    FROM tf JOIN dfq USING (token) CROSS JOIN n
),
norms AS (
    SELECT doc_id, CAST(SUM(wt * wt) AS BIGINT) AS n2 FROM w GROUP BY 1
),
dots AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(SUM(a.wt * b.wt) AS BIGINT) AS dot
    FROM w a JOIN w b
      ON a.token = b.token AND a.lang = b.lang AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, dot,
       CAST(dot AS DOUBLE)
           / (SQRT(CAST(x.n2 AS DOUBLE)) * SQRT(CAST(y.n2 AS DOUBLE)))
           AS cos_sim
FROM dots
JOIN norms x ON x.doc_id = id_a
JOIN norms y ON y.doc_id = id_b
WHERE CAST(dot AS DOUBLE)
      / (SQRT(CAST(x.n2 AS DOUBLE)) * SQRT(CAST(y.n2 AS DOUBLE)))
      >= {_TC_THRESH / 1000.0!r}
"""


@q("tfidf_cosine_pairs_docs", _ORACLE_TFIDF_COS)
def tfidf_cosine_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs, blocked by lang
    (operators/text.py:tfidf_cosine_pairs) — completes the similarity
    triad next to dense embedding cosine and shingle Jaccard: posting-
    join candidates over the df ≤ 10%-of-corpus vocabulary (stop-wording
    that scales WITH n_docs — a fixed cap measured 72 pairs at 500
    docs and 0 at 5000 — applied to dot AND norms), exact BIGINT dot of
    1e3-scaled integer weights, IEEE-exact sqrt denominator. The idf
    rounding is the proven tfidf_top_terms integer proxy at the scale
    that keeps Σw² inside BIGINT."""
    from ..operators.text import tfidf_cosine_pairs

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        docs, threshold_permille=_TC_THRESH, max_df_permille=_TC_MAXDF_PM
    )


# ---------------------------------------------------------------------------
# First-touch session attribution — which entry event type opens the
# sessions that convert (the classic web-analytics attribution query,
# built on the engine's pinned session definition).
# ---------------------------------------------------------------------------

_ORACLE_ATTRIBUTION = """
WITH e AS (
    SELECT user_id, ts, event_type, event_id, value
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
m AS (
    SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                   THEN 1 ELSE 0 END AS brk
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *, SUM(brk) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS sid
    FROM m
),
f AS (
    SELECT *, FIRST_VALUE(event_type) OVER (
        PARTITION BY user_id, sid ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS first_type
    FROM s
)
SELECT first_type,
       CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT) AS n_sessions,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
            AS BIGINT) AS n_targets,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                              THEN CAST(value AS DECIMAL(18,2)) END),
                     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS target_value
FROM f
GROUP BY first_type
"""


@q("session_attribution_first_touch", _ORACLE_ATTRIBUTION)
def session_attribution_first_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution over 30-min gap sessions
    (operators/funnel.py:session_attribution): every purchase is
    attributed to the event type that OPENED its session, answering
    "which entry point converts". Session definition is the pinned
    user_sessions/session_window semantics with a deterministic
    (ts, event_id) tie order so equal timestamps cannot flip the
    first touch; the money sum is DECIMAL-exact. One user-keyed
    shuffle drives all three windows; the final aggregate is
    |event types| rows."""
    from ..operators.funnel import session_attribution

    events = load_events(spark, sf_dir)
    return session_attribution(events, gap_minutes=30)


# ---------------------------------------------------------------------------
# Language-ID confusion matrix — the labeled-vs-detected agreement
# audit over the oracled stopword-marker detector.
# ---------------------------------------------------------------------------


def _oracle_lang_confusion() -> str:
    from .driver_queries import _MARKER_SQL

    h = {
        lg: (
            rf"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)),"
            rf" '\s+'), x -> LIST_CONTAINS({_MARKER_SQL[lg]}, x)))"
        )
        for lg in ("de", "en", "es", "fr")
    }
    return f"""
WITH scored AS (
    SELECT lang, {h['de']} AS h_de, {h['en']} AS h_en,
           {h['es']} AS h_es, {h['fr']} AS h_fr
    FROM documents
),
d AS (
    SELECT lang, CASE
        WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
        WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
        WHEN h_es >= h_fr THEN 'es'
        ELSE 'fr' END AS detected_lang
    FROM scored
)
SELECT lang, detected_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       lang = detected_lang AS agree
FROM d
GROUP BY lang, detected_lang
"""


@q("lang_confusion_matrix", _oracle_lang_confusion())
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-vs-detected language confusion matrix over the
    stopword-marker detector (operators/text.py:detect_language —
    the same arithmetic lang_detect_counts oracles): per (label,
    detection) document counts plus the agreement flag — the audit
    that tells a curation pipeline WHERE its language router
    disagrees with upstream labels (e.g. every zh document lands in
    'und' here because the marker lists carry no zh stopwords —
    visible as a matrix row, invisible in marginal counts). Map-only
    detector scan + one grouped count."""
    from pyspark.sql import functions as F

    from ..operators import text as _text

    docs = load_table(spark, sf_dir, "documents")
    return (
        _text.detect_language(docs)
        .groupBy("lang", "detected_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("agree", F.col("lang") == F.col("detected_lang"))
    )


# ---------------------------------------------------------------------------
# Key-skew audit — the pre-shuffle measurement that decides whether a
# key needs salting/AQE-skew-split before a 100 TB join runs.
# ---------------------------------------------------------------------------

_SKEW_K = 10

_ORACLE_SKEW = f"""
WITH counts AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
),
stats AS (
    SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM counts
)
SELECT user_id, n_rows,
       CAST((1000 * n_rows) // total AS BIGINT) AS share_permille,
       CAST((1000 * n_rows * n_keys) // total AS BIGINT) AS skew_permille,
       CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id ASC)
            AS INT) AS rank
FROM counts CROSS JOIN stats
ORDER BY n_rows DESC, user_id ASC
LIMIT {_SKEW_K}
"""


@q("key_skew_audit_users", _ORACLE_SKEW)
def key_skew_audit_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest user keys in the events stream with exact
    integer skew statistics (operators/skew.py:key_skew_audit):
    share_permille (fraction of all rows) and skew_permille (how many
    uniform fair-shares the key holds — 1000 = perfectly balanced).
    The measurement behind the engine's salting decisions
    (salted_aggregate / salted_join / AQE skew split): run it on the
    join key BEFORE the 100 TB shuffle. One scan; the top-k cut is
    TakeOrderedAndProject, never a full sort."""
    from ..operators.skew import key_skew_audit

    events = load_events(spark, sf_dir)
    return key_skew_audit(events, "user_id", k=_SKEW_K)


# ---------------------------------------------------------------------------
# Empirical-Bayes shrunk source badness rates — the small-source fix
# for quality routing, over the blocklist flag.
# ---------------------------------------------------------------------------

_EB_M = 50


def _oracle_eb_rates() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(_BLOCKLIST))
    return rf"""
WITH flagged AS (
    SELECT source,
           CAST(GREATEST(LEN(LIST_INTERSECT(
               LIST_DISTINCT(LIST_TRANSFORM(
                   LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text),
                                                  '[ \t\n\r\f]+'),
                               x -> x <> ''),
                   t -> LOWER(t))),
               [{terms}])), 0) > 0 AS BIGINT) AS bad
    FROM documents
    WHERE source IS NOT NULL
),
per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(bad) AS BIGINT) AS n_flagged
    FROM flagged GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_rows) AS BIGINT) AS n_tot,
           CAST(SUM(n_flagged) AS BIGINT) AS bad_tot
    FROM per
)
SELECT source, n_rows, n_flagged,
       CAST((1000 * n_flagged) // n_rows AS BIGINT) AS raw_permille,
       CAST((1000 * (n_flagged * n_tot + {_EB_M} * bad_tot))
            // ((n_rows + {_EB_M}) * n_tot) AS BIGINT) AS shrunk_permille
FROM per CROSS JOIN tot
"""


@q("eb_shrunk_bad_rates", _oracle_eb_rates())
def eb_shrunk_bad_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source blocklist-hit rates with empirical-Bayes shrinkage
    toward the global rate (operators/quality.py:eb_shrunk_rates,
    prior strength 50 phantom docs) — the small-source stabilizer for
    quality routing: raw and shrunk permille side by side, both exact
    integer arithmetic, so the driver hash re-proves the posterior-
    mean arithmetic every round. One corpus scan (the blocklist flag
    is the map-only C4 gate); totals broadcast from the per-source
    relation."""
    from pyspark.sql import functions as F

    from ..operators.quality import blocklist_gate, eb_shrunk_rates

    docs = load_table(spark, sf_dir, "documents")
    flagged = blocklist_gate(
        docs.filter(F.col("source").isNotNull()), _BLOCKLIST
    ).withColumn("bad", F.col("n_blocked_terms") > 0)
    return eb_shrunk_rates(flagged, "source", "bad", prior_strength=_EB_M)


# ---------------------------------------------------------------------------
# PMI collocations — the information-theoretic complement of the
# frequency-ranked bigram_collocations: which word pairs co-occur far
# beyond chance, per language.
# ---------------------------------------------------------------------------

_PMI_K, _PMI_MIN = 5, 3

_ORACLE_PMI = rf"""
WITH tok AS (
    SELECT d.lang, REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+') AS t
    FROM documents d
    WHERE LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) >= 2
),
bg AS (
    SELECT lang, t[i] AS w1, t[i + 1] AS w2
    FROM tok, UNNEST(RANGE(1, LEN(t))) AS r(i)
),
c12 AS (
    SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
    FROM bg GROUP BY 1, 2, 3
),
c1 AS (SELECT lang, w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1, 2),
c2 AS (SELECT lang, w2, CAST(SUM(n12) AS BIGINT) AS n2 FROM c12 GROUP BY 1, 2),
nn AS (SELECT lang, CAST(SUM(n12) AS BIGINT) AS n FROM c12 GROUP BY 1),
scored AS (
    SELECT c12.lang, w1, w2, n12,
           CAST(ROUND(LN((CAST(n AS DOUBLE) * CAST(n12 AS DOUBLE))
                         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                      * 1e6) AS BIGINT) AS pmi_micro
    FROM c12
    JOIN c1 USING (lang, w1)
    JOIN c2 USING (lang, w2)
    JOIN nn USING (lang)
    WHERE n12 >= {_PMI_MIN}
)
SELECT lang, w1, w2, n12, pmi_micro,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
       ) AS INT) AS rk
FROM scored
QUALIFY rk <= {_PMI_K}
"""


@q("pmi_collocations", _ORACLE_PMI)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 PMI collocations per language — pairs that co-occur
    beyond chance (``PMI = ln(N·c12 / (c1·c2))``, the
    information-theoretic complement of frequency-ranked
    bigram_collocations: 'of the' tops frequency, glued names top
    PMI). Unigram margins come from the bigram relation itself (left/
    right sums), so one corpus scan feeds everything; ranking is by
    the micro-scaled integer PMI (the tfidf integer-ln proxy) with
    (w1, w2) tie order, and the ``n12 ≥ {min}`` gate kills the
    hapax-pair PMI explosion. All relations vocab-bounded after the
    explode."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang", F.transform(_tokens("text"), F.lower).alias("t")
    ).filter(F.size("t") >= 2)
    idx = F.sequence(F.lit(0), F.size("t") - 2)
    bg = base.select(
        "lang",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("w1"),
                    F.element_at("t", i + 2).alias("w2"),
                ),
            )
        ).alias("_p"),
    ).select("lang", "_p.w1", "_p.w2")
    c12 = bg.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("long").alias("n12")
    )
    c1 = c12.groupBy("lang", "w1").agg(F.sum("n12").alias("n1"))
    c2 = c12.groupBy("lang", "w2").agg(F.sum("n12").alias("n2"))
    nn = c12.groupBy("lang").agg(F.sum("n12").alias("n"))
    scored = (
        c12.filter(F.col("n12") >= _PMI_MIN)
        .join(c1, ["lang", "w1"])
        .join(c2, ["lang", "w2"])
        .join(F.broadcast(nn), "lang")
        .withColumn(
            "pmi_micro",
            F.expr(
                "CAST(ROUND(LN((CAST(n AS DOUBLE) * CAST(n12 AS DOUBLE))"
                " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) * 1e6)"
                " AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("pmi_micro"), F.asc("w1"), F.asc("w2")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _PMI_K)
        .select("lang", "w1", "w2", "n12", "pmi_micro", "rk")
    )
