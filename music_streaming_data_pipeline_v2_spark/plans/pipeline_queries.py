"""Round-2 batch 3: wider relational shapes + training-data-pipeline ops.

Two groups:

* **Relational breadth** — TPC-H-shaped plans the reference's Spark job
  (glue_jobs/music-streaming-transform.py) never needed but a warehouse
  user would expect: bi-dimensional volume (Q7 shape), conditional-share
  ratio (Q14), disjunction-of-conjunctions pushdown (Q19), scalar-avg +
  NOT EXISTS (Q22).

* **Pipeline ops** — incremental aggregate maintenance (merge partial
  aggregates instead of recompute), CDC latest-state apply, Gopher-style
  intra-document repetition filtering, domain mix reweighting, and 8-bit
  scalar quantization of embeddings.

All queries follow driver_queries' cross-engine exactness rules:
integer counts, decimal-exact sums, and single-expression-tree double
arithmetic evaluated identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table
from .driver_queries import _dec, _utc, load_events, q

# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipped between nation pairs
# ---------------------------------------------------------------------------

_ORACLE_BI_NATION = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
            AS DOUBLE) AS volume,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY 1, 2, 3
"""


@q("bi_nation_volume", _ORACLE_BI_NATION)
def bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between (supplier nation, customer
    nation) pairs per ship year.

    Scale shape: the only big⋈big join is lineitem⋈orders on orderkey;
    supplier, customer, and both nation roles are broadcast, so the
    whole geography enrichment adds zero shuffles. The date filter is
    pushed to the lineitem scan (min/max row-group pruning)."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(disc_price).cast("double").alias("volume"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share per month
# ---------------------------------------------------------------------------

_ORACLE_PROMO_SHARE = """
SELECT CAST(DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))
                          AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
            AS DOUBLE) AS promo_share,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY 1
"""


@q("promo_revenue_share", _ORACLE_PROMO_SHARE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fraction of revenue from PROMO parts per ship
    month — conditional aggregation over a fact⋈broadcast-dim join,
    with the share computed as ONE double division over two exact
    decimal sums (deterministic cross-engine)."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo_price = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", F.to_date("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(
            (
                F.sum(promo_price).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction-of-conjunctions predicate
# ---------------------------------------------------------------------------

_ORACLE_DISJUNCTIVE = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@q("disjunctive_part_revenue", _ORACLE_DISJUNCTIVE)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing join-side and probe-side
    predicates. Catalyst extracts the common sub-predicates it can push
    below the join (brand/size reach the part scan; the quantity bounds
    union `l_quantity BETWEEN 1 AND 50` is derivable for the lineitem
    scan) and evaluates the residual disjunction post-join."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    disc_price = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    return joined.filter(cond).agg(
        F.sum(disc_price).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-average subquery + NOT EXISTS
# ---------------------------------------------------------------------------

_ORACLE_IDLE_RICH = """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS threshold
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > threshold
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_mktsegment
"""


@q("idle_rich_customers", _ORACLE_IDLE_RICH)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance exceeds the average
    positive balance (uncorrelated scalar subquery → broadcast 1-row
    relation) and with no RECENT order (NOT EXISTS over a filtered
    orders subquery → left_anti join), aggregated per market segment.

    The threshold is CAST(decimal-sum AS DOUBLE)/COUNT — one division,
    identical operands in both engines, so the > comparison partitions
    customers identically. "Idle" means no order since 2000-01-01
    (ADVICE r2): every testdata customer has SOME order, so the
    original unfiltered NOT EXISTS was vacuously false and the
    anti-join path never saw data; the recency cut makes the predicate
    genuinely selective at every gate scale factor (5 rows at sf0.001,
    55 at sf0.01) while keeping the same plan shape — and pushing the
    date filter below the anti-join shrinks its build side, exactly
    what you want at 100 TB."""
    _utc(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("threshold")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (IVM-style partial-aggregate merge)
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "2024-01-25"

_ORACLE_INCREMENTAL = """
SELECT event_type,
       CAST(ts AS DATE) AS date,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@q("incremental_daily_agg", _ORACLE_INCREMENTAL)
def incremental_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the daily aggregate is kept as
    mergeable partials (count + decimal sum — both algebraic), and a
    new-data increment is folded in by re-aggregating the union of
    partials instead of recomputing from raw history.

    The oracle is the FULL recompute — proving partial-merge ≡
    recompute. At 100 TB this is the difference between scanning one
    day and scanning the whole fact table; the merge aggregate's input
    is two day-keyed partial relations, shuffled by the (type, date)
    key only (map-side combine leaves ~|groups| rows per partition).
    Decimal (not double) partial sums make the two-step summation
    order-insensitive, so the split point cannot change the result."""
    _utc(spark)
    events = load_events(spark, sf_dir)
    cutoff = F.lit(_IVM_CUTOFF).cast("date")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.to_date("ts").alias("date")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    history = partials(events.filter(F.to_date("ts") < cutoff))
    increment = partials(events.filter(F.to_date("ts") >= cutoff))
    return (
        history.unionByName(increment)
        .groupBy("event_type", "date")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# CDC latest-state apply (upsert/delete change feed → current snapshot)
# ---------------------------------------------------------------------------

_ORACLE_CDC = """
WITH ranked AS (
    SELECT user_id, event_type, value, ts,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_type AS last_op, value AS last_value, ts AS last_ts
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@q("cdc_latest_state", _ORACLE_CDC)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: treating events as a change feed keyed by user_id and
    sequenced by (ts, event_id) — 'error' acts as the delete op — emit
    the current snapshot: each key's latest change, keys whose latest
    change is a delete dropped.

    One window shuffle on the key; at scale this is the standard
    "apply a CDC batch to a snapshot" kernel (dedup-latest then
    filter deletes), and the same plan serves foreachBatch MERGE
    sources. The (ts, event_id) sort key is unique, so rn=1 is
    deterministic in both engines."""
    _utc(spark)
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filter (duplicate word-trigram fraction)
# ---------------------------------------------------------------------------

_ORACLE_REPETITION = """
WITH t AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(trim(text), '[ \t\n\r\f]+'),
                       x -> x <> '') AS w
    FROM documents
),
g AS (
    SELECT doc_id, source,
           CAST(len(w) - 2 AS BIGINT) AS total_3grams,
           CAST(len(list_distinct(list_transform(
                range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
           ))) AS BIGINT) AS distinct_3grams
    FROM t WHERE len(w) >= 3
)
SELECT doc_id, source, total_3grams, distinct_3grams,
       CAST(total_3grams - distinct_3grams AS DOUBLE) / total_3grams
           AS rep_ratio,
       (CAST(total_3grams - distinct_3grams AS DOUBLE) / total_3grams)
           > 0.5 AS is_repetitive
FROM g
"""


@q("doc_repetition_filter", _ORACLE_REPETITION)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal (Rae et al. 2021 §A1.1):
    the fraction of a document's word 3-grams that are duplicates.
    High-ratio docs are boilerplate/spam candidates for curation.

    Entirely narrow (per-row array ops — tokenize, slide a 3-window
    via `transform(sequence(...))`, `array_distinct`): zero shuffles,
    zero UDFs, scales linearly with bytes scanned. rep_ratio is one
    double division of two exact integers, so hash-exact.

    Tokenizer uses the explicit class [ \\t\\n\\r\\f]+ instead of \\s+
    (ADVICE r2): Java's \\s includes \\x0B but RE2's (DuckDB) does not,
    so the same class is spelled out in both engines to make the split
    engine-independent by construction."""
    _utc(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), "[ \t\n\r\f]+"), lambda t: t != F.lit("")
    )
    d = docs.select("doc_id", "source", toks.alias("w")).filter(
        F.size("w") >= 3
    )
    grams = F.expr(
        "transform(sequence(0, size(w) - 3),"
        " i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))"
    )
    d = d.select(
        "doc_id",
        "source",
        (F.size("w") - 2).cast("long").alias("total_3grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("distinct_3grams"),
    )
    ratio = (
        (F.col("total_3grams") - F.col("distinct_3grams")).cast("double")
        / F.col("total_3grams")
    )
    return d.select(
        "doc_id",
        "source",
        "total_3grams",
        "distinct_3grams",
        ratio.alias("rep_ratio"),
        (ratio > 0.5).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------------
# Domain mix reweighting (uniform-target sampling weights per source)
# ---------------------------------------------------------------------------

_ORACLE_MIX_WEIGHTS = """
WITH per_source AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
           COUNT(*) AS n_sources
    FROM per_source
)
SELECT source, n_docs,
       CAST(total AS DOUBLE) / (n_sources * n_docs) AS weight
FROM per_source, tot
"""


@q("source_mix_weights", _ORACLE_MIX_WEIGHTS)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source sampling multiplier that would
    equalize the corpus across sources (weight = uniform share /
    actual share). The training-data counterpart of a mixture config:
    join these weights back to docs to drive weighted sampling.

    Two tiny aggregates; the totals relation is one row, broadcast."""
    _utc(spark)
    per_source = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = per_source.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count("*").alias("n_sources"),
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (
            F.col("total").cast("double")
            / (F.col("n_sources") * F.col("n_docs"))
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# 8-bit scalar quantization of embeddings (per-dimension min/max codebook)
# ---------------------------------------------------------------------------

_ORACLE_QUANTIZE = """
WITH flat AS (
    SELECT vec_id, i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)
),
stats AS (
    SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM flat GROUP BY dim
),
codes AS (
    SELECT vec_id,
           CASE WHEN mx > mn
                THEN CAST(FLOOR(((x - mn) / (mx - mn)) * 255 + 0.5) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS code
    FROM flat JOIN stats USING (dim)
)
SELECT vec_id,
       COUNT(*) AS n_dims,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(MIN(code) AS BIGINT) AS code_min,
       CAST(MAX(code) AS BIGINT) AS code_max
FROM codes GROUP BY vec_id
"""


@q("embedding_quantize_codes", _ORACLE_QUANTIZE)
def embedding_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit scalar quantization (the SQ8 step of an IVF-SQ index):
    per-dimension min/max codebook over the corpus, each float mapped
    to round(255·(x−min)/(max−min)). Emitted as per-vector code
    digests (count/sum/min/max) so the oracle hash pins every code.

    Scale shape: the codebook is a 64-row aggregate (broadcast back);
    quantization itself is narrow. floor(v+0.5) instead of round()
    because banker's-vs-half-up tie rules differ across engines while
    floor is unambiguous; float→double widening is exact in both, so
    codes are deterministic cross-engine."""
    _utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    stats = flat.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.floor(
            ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn"))) * 255
            + 0.5
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        flat.join(F.broadcast(stats), "dim")
        .select("vec_id", code.alias("code"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_dims"),
            F.sum("code").cast("long").alias("code_sum"),
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
        )
    )
