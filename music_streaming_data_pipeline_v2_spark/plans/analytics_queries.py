"""Product/cohort analytics and imputation queries (round-2 batch 2).

The reference computes daily KPI grains and top-K rankings
(glue_jobs/music-streaming-transform.py:84-160); these queries extend
that surface with the next layer a streaming-analytics warehouse needs:
cohort retention, cumulative-audience growth, sliding-window distinct
counts, co-occurrence (market-basket) mining, collocation mining,
robust (winsorized) means, and time-series gap imputation.

Every query follows driver_queries' cross-engine exactness rules:
integer counts, decimal-exact sums, and single-expression-tree double
arithmetic evaluated identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import _utc, q

# ---------------------------------------------------------------------------
# Cohort retention (orders: first-order month = cohort, active months offset)
# ---------------------------------------------------------------------------

_ORACLE_RETENTION = """
WITH o AS (
    SELECT o_custkey AS cust,
           DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS m
    FROM orders
),
f AS (SELECT cust, MIN(m) AS cm FROM o GROUP BY cust),
a AS (SELECT DISTINCT cust, m FROM o)
SELECT cm AS cohort_month,
       CAST((YEAR(m) - YEAR(cm)) * 12 + (MONTH(m) - MONTH(cm)) AS BIGINT)
           AS month_offset,
       COUNT(*) AS n_active
FROM a JOIN f USING (cust)
GROUP BY 1, 2
"""


@q("monthly_retention_cohorts", _ORACLE_RETENTION)
def monthly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: customers grouped by first-order
    month (the cohort), counted in every later month they were active.

    Scale shape: one shuffle on cust for the min-month aggregate, the
    distinct-activity relation reuses the same hash partitioning for
    the join (co-partitioned, no extra exchange), and the final
    aggregate is cohort×offset-sized — tiny regardless of input."""
    _utc(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.to_date(F.date_trunc("month", F.to_date("o_orderdate"))).alias("m"),
    )
    first = o.groupBy("cust").agg(F.min("m").alias("cm"))
    active = o.distinct()
    offset = (
        (F.year("m") - F.year("cm")) * 12 + (F.month("m") - F.month("cm"))
    ).cast("long")
    return (
        active.join(first, "cust")
        .groupBy(F.col("cm").alias("cohort_month"), offset.alias("month_offset"))
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Cumulative distinct audience, without a running COUNT(DISTINCT)
# ---------------------------------------------------------------------------

_ORACLE_CUM_BUYERS = """
WITH f AS (
    SELECT o_custkey,
           DATE_TRUNC('month', MIN(CAST(o_orderdate AS DATE))) AS fm
    FROM orders GROUP BY o_custkey
),
nm AS (SELECT fm AS month, COUNT(*) AS n_new FROM f GROUP BY fm)
SELECT month, n_new,
       CAST(SUM(n_new) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_cum_buyers
FROM nm
"""


@q("cumulative_unique_buyers", _ORACLE_CUM_BUYERS)
def cumulative_unique_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct buyers per month via the first-seen trick:
    a cumulative COUNT(DISTINCT) over an expanding window is not
    parallelizable, but "distinct users up to month M" ≡ "users whose
    FIRST month ≤ M" — one groupBy(user) shuffle, a months-sized
    aggregate, and a running sum over |months| rows (the only
    single-partition step, bounded by calendar size, not data size)."""
    _utc(spark)
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.to_date(F.date_trunc("month", F.min(F.to_date("o_orderdate")))).alias("fm")
    )
    new_per_month = first.groupBy(F.col("fm").alias("month")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return new_per_month.select(
        "month", "n_new", F.sum("n_new").over(w).alias("n_cum_buyers")
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct count via contribution explode
# ---------------------------------------------------------------------------

_ORACLE_ROLLING_DISTINCT = """
WITH od AS (
    SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
    FROM orders
),
b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd FROM od),
spine AS (
    SELECT CAST(UNNEST(GENERATE_SERIES(mind, maxd, INTERVAL 1 DAY)) AS DATE)
        AS day
    FROM b
)
SELECT day, COUNT(DISTINCT od.cust) AS n_active_30d
FROM spine LEFT JOIN od ON od.d BETWEEN day - 29 AND day
GROUP BY day
"""


@q("rolling_30d_distinct_customers", _ORACLE_ROLLING_DISTINCT)
def rolling_30d_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day distinct customers for every calendar day.

    Sliding DISTINCT windows have no parallel window-function form, so
    this uses the contribution-explode plan: each (cust, order-day)
    fans out to the ≤30 target days it can influence, then one
    groupBy(day) count-distinct. That trades 30× intermediate rows for
    full shuffle parallelism — at 100 TB the alternative (per-day
    range-joined distinct) is a quadratic nested loop. The DuckDB
    oracle uses the naive range join, which is fine at oracle scale
    and makes the semantic contract explicit."""
    _utc(spark)
    od = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            F.to_date("o_orderdate").alias("d"),
        )
        .distinct()
    )
    bounds = od.agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    spine = bounds.select(
        F.explode(F.sequence("mind", "maxd")).alias("day")
    )
    contrib = od.select(
        "cust",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 29))).alias("day"),
    )
    counts = contrib.groupBy("day").agg(
        F.countDistinct("cust").alias("n_active_30d")
    )
    return (
        spine.join(counts, "day", "left")
        .select("day", F.coalesce("n_active_30d", F.lit(0)).alias("n_active_30d"))
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (brands co-ordered within an order)
# ---------------------------------------------------------------------------

_ORACLE_BASKET = """
WITH ob AS (
    SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
    FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_orders
FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
GROUP BY 1, 2
"""


@q("brand_basket_pairs", _ORACLE_BASKET)
def brand_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining: for every unordered brand pair, in how
    many orders do both appear? The (order, brand) relation is
    deduped first so the pair count is per-order, not per-line.

    Scale shape: part is the broadcast side (small dim vs lineitem;
    at a 100 TB SF where part outgrows the broadcast threshold this
    becomes a shuffle join on partkey — both sides already need that
    exchange). The (order, brand) relation is explicitly hash-
    partitioned on ok BEFORE deduplication: HashPartitioning(ok)
    satisfies the dedup's ClusteredDistribution(ok, brand) (subset
    rule) AND the self-join's requirement, so one shuffle serves
    dedup + both join sides (a naive .distinct() partitions on the
    pair and forces a second ok-only exchange per side — 7 exchanges
    vs 5 measured). Pair generation is bounded by brands-per-order
    (≈4), never a cross product; output is |brands|²/2 rows —
    constant in data size."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .repartition("ok")
        .dropDuplicates(["ok", "brand"])
    )
    a = ob.alias("a")
    b = ob.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Collocation mining: top bigrams per language
# ---------------------------------------------------------------------------

_ORACLE_BIGRAMS = r"""
WITH tok AS (
    SELECT lang, REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+') AS t
    FROM documents
    WHERE LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) >= 2
),
bg AS (
    SELECT lang,
           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                                 i -> ARRAY_TO_STRING(t[i:i+1], ' '))) AS bigram
    FROM tok
),
c AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2)
SELECT lang, bigram, n,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram)
            AS INT) AS rk
FROM c
QUALIFY rk <= 5
"""


@q("bigram_collocations", _ORACLE_BIGRAMS)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams (with multiplicity — collocations, unlike the
    distinct shingles of dedup) per language. Plan: array build →
    explode → two-phase count → per-lang top-K window with the
    deterministic (count DESC, bigram ASC) tie-break. The explode is
    the scale hot spot; counts partial-aggregate map-side so the
    shuffle carries (lang, bigram) partials, not raw bigrams."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    base = docs.select("lang", toks.alias("t")).filter(F.size("t") >= 2)
    idx = F.sequence(F.lit(0), F.size("t") - 2)
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("t", i + 1, 2)))
    counts = (
        base.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


# ---------------------------------------------------------------------------
# Robust statistics: winsorized mean
# ---------------------------------------------------------------------------

_ORACLE_WINSORIZED = """
WITH pct AS (
    SELECT event_type,
           ROUND(quantile_cont(value, 0.05), 6) AS lo,
           ROUND(quantile_cont(value, 0.95), 6) AS hi
    FROM events GROUP BY event_type
),
agg AS (
    SELECT e.event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN value < lo THEN 1 END) AS n_lo,
           COUNT(CASE WHEN value > hi THEN 1 END) AS n_hi,
           COALESCE(SUM(CASE WHEN value BETWEEN lo AND hi
                             THEN CAST(value AS DECIMAL(18,2)) END),
                    0) AS s_mid,
           ANY_VALUE(lo) AS lo, ANY_VALUE(hi) AS hi
    FROM events e JOIN pct USING (event_type)
    GROUP BY e.event_type
)
SELECT event_type, n, n_lo, n_hi, lo, hi,
       ((CAST(s_mid AS DOUBLE) + n_lo * lo) + n_hi * hi) / n
           AS winsorized_mean
FROM agg
"""


@q("winsorized_means", _ORACLE_WINSORIZED)
def winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clamped) mean per event type — the robust
    mean a quality pipeline uses when raw values have heavy tails.

    Hash-exact across engines by decomposition: clamping replaces
    every value below lo with lo and above hi with hi, so the mean is
    (Σ_mid + n_lo·lo + n_hi·hi)/n where Σ_mid is a decimal-exact sum
    of the unclamped (2-decimal) values and n_lo/n_hi are integer
    counts. The percentile thresholds are rounded to 6 dp before any
    comparison so both engines clamp against identical doubles; the
    final expression is one fixed-shape IEEE tree. Two passes over
    events (percentiles, then one aggregate with the tiny threshold
    table broadcast) — the same shape at any scale."""
    from .driver_queries import load_events

    events = load_events(spark, sf_dir)
    pct = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    j = events.join(F.broadcast(pct), "event_type")
    v = F.col("value")
    agg = j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(v < F.col("lo"), True)).alias("n_lo"),
        F.count(F.when(v > F.col("hi"), True)).alias("n_hi"),
        F.coalesce(
            F.sum(
                F.when(
                    v.between(F.col("lo"), F.col("hi")), v.cast("decimal(18,2)")
                )
            ),
            F.lit(0).cast("decimal(28,2)"),
        ).alias("s_mid"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    wmean = (
        (F.col("s_mid").cast("double") + F.col("n_lo") * F.col("lo"))
        + F.col("n_hi") * F.col("hi")
    ) / F.col("n")
    return agg.select(
        "event_type", "n", "n_lo", "n_hi", "lo", "hi",
        wmean.alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# Time-series imputation: linear interpolation of missing days
# ---------------------------------------------------------------------------

_ORACLE_INTERPOLATE = """
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           SUM(CAST(value AS DECIMAL(18,2))) AS v
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd FROM p),
u AS (SELECT DISTINCT user_id FROM p),
spine AS (
    SELECT user_id,
           CAST(UNNEST(GENERATE_SERIES(mind, maxd, INTERVAL 1 DAY)) AS DATE)
               AS d
    FROM u, b
),
s AS (
    SELECT spine.user_id, spine.d, p.v
    FROM spine LEFT JOIN p ON p.user_id = spine.user_id AND p.d = spine.d
),
w AS (
    SELECT user_id, d, v,
           LAST_VALUE(v IGNORE NULLS) OVER pw AS pv,
           LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER pw AS pd,
           FIRST_VALUE(v IGNORE NULLS) OVER nw AS nv,
           FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER nw AS nd
    FROM s
    WINDOW pw AS (PARTITION BY user_id ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           nw AS (PARTITION BY user_id ORDER BY d
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, d AS date,
       CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
            WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
            WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
            ELSE (CAST(pv AS DOUBLE) * (nd - d) + CAST(nv AS DOUBLE) * (d - pd))
                 / (nd - pd)
       END AS v_filled,
       CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS is_interpolated
FROM w
"""


@q("interpolated_purchase_series", _ORACLE_INTERPOLATE)
def interpolated_purchase_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily purchase series with missing days linearly
    interpolated between the nearest observed neighbors (edges filled
    with the nearest value) — the imputation step before feeding a
    regular-grid model.

    Exactness: observed daily sums are decimal; the interpolation
    (pv·(nd−d) + nv·(d−pd)) / (nd−pd) is one IEEE tree over exact
    operands and integer day distances, identical in both engines.
    Scale shape: the spine is |users|×|days| (explode, no shuffle),
    the left join and both ignore-nulls windows share one hash
    partitioning on user_id — a single exchange end-to-end."""
    from .driver_queries import load_events

    _utc(spark)
    p = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    bounds = p.agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    users = p.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("mind", "maxd")).alias("d")
    )
    s = spine.join(p, ["user_id", "d"], "left")
    pw = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nw = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col("v")
    w = s.select(
        "user_id", "d", "v",
        F.last("v", ignorenulls=True).over(pw).alias("pv"),
        F.last(F.when(v.isNotNull(), F.col("d")), ignorenulls=True)
        .over(pw)
        .alias("pd"),
        F.first("v", ignorenulls=True).over(nw).alias("nv"),
        F.first(F.when(v.isNotNull(), F.col("d")), ignorenulls=True)
        .over(nw)
        .alias("nd"),
    )
    interp = (
        F.col("pv").cast("double") * F.datediff("nd", "d")
        + F.col("nv").cast("double") * F.datediff("d", "pd")
    ) / F.datediff("nd", "pd")
    v_filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .otherwise(interp)
    )
    return w.select(
        "user_id",
        F.col("d").alias("date"),
        v_filled.alias("v_filled"),
        F.when(v.isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_interpolated"),
    )
