"""Oracle SQL shared between plans modules.

Import-order safety: this module imports NOTHING from the package, so
any sibling (round3, round4, ...) can pull these constants at module
top without creating the circular sibling-first chain that
partially-initialized imports die on (a round-4 top-level
`from .round3_queries import _ORACLE_DECONTAM` crashed any process
whose FIRST plans import was round3_queries itself)."""

from __future__ import annotations

#: Engine-safe whitespace tokenization of documents.text (DuckDB).
_W = r"LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '[ \t\n\r\f]+'), x -> x <> '')"

#: The 0..255 content bucket of doc_id — md5 hex-digit arithmetic,
#: the DuckDB twin of operators/sampling.py:hash_bucket (unsalted).
_BUCKET = (
    "(INSTR('0123456789abcdef', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (INSTR('0123456789abcdef', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

_ORACLE_DECONTAM = f"""
WITH b AS (
    SELECT doc_id, text, {_BUCKET} AS bkt FROM documents
),
g AS (
    SELECT doc_id, bkt,
           LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, LEN({_W}) - 3),
               i -> ARRAY_TO_STRING(({_W})[i : i + 4], ' ')
           )) AS grams
    FROM b WHERE LEN({_W}) >= 5
),
tg AS (SELECT doc_id AS train_id, UNNEST(grams) AS gram FROM g WHERE bkt < 204),
sg AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE bkt >= 230)
SELECT sg.doc_id,
       COUNT(DISTINCT sg.gram) AS n_shared_grams,
       COUNT(DISTINCT tg.train_id) AS n_train_docs_hit
FROM sg JOIN tg ON sg.gram = tg.gram
GROUP BY sg.doc_id
"""


def _md5_bucket_sql(expr: str) -> str:
    """SQL: the 0..255 content bucket of ``expr`` (cast to VARCHAR) —
    md5 hex-digit arithmetic, the DuckDB twin of
    operators/sampling.py:hash_bucket for an arbitrary key expression
    (``_BUCKET`` is this applied to ``doc_id``)."""
    h = f"MD5(CAST({expr} AS VARCHAR))"
    return (
        f"(INSTR('0123456789abcdef', SUBSTRING({h}, 1, 1)) - 1) * 16"
        f" + (INSTR('0123456789abcdef', SUBSTRING({h}, 2, 1)) - 1)"
    )


#: Near-dup connected components over documents (token-set Jaccard
#: >= 0.8 blocked by lang, recursive-CTE transitive closure, component
#: = min reachable doc_id). Ends with ``alldocs(doc_id, component)``
#: covering EVERY document (singletons map to themselves) — shared by
#: dedup_clusters and the cluster-level curation oracles built on it.
_CC_CTES = r"""
WITH RECURSIVE toks AS (
    SELECT doc_id, lang,
           LIST_DISTINCT(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) AS tok
    FROM documents
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(LEN(LIST_INTERSECT(a.tok, b.tok)) AS DOUBLE)
          / LEN(LIST_DISTINCT(LIST_CONCAT(a.tok, b.tok))) >= 0.8
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
alldocs AS (
    SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
)"""
