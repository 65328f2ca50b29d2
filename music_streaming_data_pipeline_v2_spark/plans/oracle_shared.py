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
