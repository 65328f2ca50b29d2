"""Heavy hitters at corpus scale: Misra-Gries candidates + exact verify.

The exact way to find values with frequency ≥ φ is a full
``groupBy(value).count()`` — a shuffle keyed by EVERY distinct value.
At 100 TB of tokens/URLs/domains that shuffle is the job. The classic
fix (Misra & Gries 1982; mergeable-summaries form in Agarwal et al.,
PODS'12) bounds the shuffle instead:

1. **Summarize per partition** (map-side, one pass): maintain k
   counters; a value with partition count > n_p/k is guaranteed to
   survive its partition's summary. Each partition emits ≤ k rows.
2. **Candidates** = union of summary keys (≤ n_partitions × k rows
   shuffled — independent of the number of distinct values). By
   pigeonhole, any value with GLOBAL count > n/k exceeds n_p/k in at
   least one partition, so the candidate set has NO false negatives
   for thresholds ≥ n/k.
3. **Exact verify**: semi-join the corpus against the (broadcast)
   candidate set and count exactly; keep count ≥ threshold.

Because step 3 is exact and step 2 can't lose a true heavy hitter,
the output is IDENTICAL to the full groupBy — same accelerator-
equivalence contract as `bloom_prefilter` (prefilter + exact verify ≡
exact), which is what lets a plain ``HAVING COUNT(*) >= t`` SQL twin
hash-check it.

The per-partition summary is the MERGEABLE form: per Arrow batch, a
vectorized ``value_counts`` merges into the running summary, then the
summary is decremented by its (k+1)-th largest count and pruned — the
standard summary-merge, error still ≤ n_p/k. No per-row Python loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(
    df: DataFrame,
    col: str,
    k: int,
    out_col: str = "value",
    with_counts: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k candidate values per
    partition, each guaranteed to include every value whose partition
    count exceeds n_p/k. One map-side pass, output ≤ n_partitions × k
    rows.

    ``with_counts=True`` additionally emits ONE marker row per
    partition — ``(value NULL, n_part = rows scanned)`` — so the
    caller can recover the exact corpus total from the SAME scan
    instead of running a separate count() action over the full input
    (the summary relation stays ≤ n_partitions × (k+1) rows)."""

    # Self-contained closure (pickle-by-value — no references to this
    # package; the driver's Python workers may not have it on path).
    def summarize(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            vals = pdf.iloc[:, 0].dropna()
            n_part += len(vals)
            vc = vals.value_counts()
            counters = (
                vc if counters.empty else counters.add(vc, fill_value=0)
            ).astype("int64")
            if len(counters) > k:
                # mergeable-summary step: subtract the (k+1)-th largest
                # count from everything and drop the non-positive rest
                counters = counters.sort_values(ascending=False)
                pivot = counters.iloc[k]
                counters = counters.iloc[:k] - pivot
                counters = counters[counters > 0]
        # list(), not the raw index: an empty summary's index is a
        # RangeIndex whose int64 dtype breaks Arrow conversion for
        # string-typed columns; an empty list is dtype-neutral
        values = list(counters.index)
        if with_counts:
            yield pd.DataFrame(
                {
                    "value": values + [None],
                    "n_part": [None] * len(values) + [n_part],
                }
            )
        else:
            yield pd.DataFrame({"value": values})

    src_type = df.schema[col].dataType.simpleString()
    schema = f"value {src_type}"
    if with_counts:
        schema += ", n_part long"
    return df.select(F.col(col)).mapInPandas(
        summarize, schema=schema
    ).withColumnRenamed("value", out_col)


def frequent_items(
    df: DataFrame,
    col: str,
    min_fraction: float,
    k: int | None = None,
) -> DataFrame:
    """All values of ``col`` with frequency ≥ ``min_fraction`` of the
    non-null rows, with their EXACT counts — identical output to the
    full groupBy, shuffle bounded by the summary size.

    ``k`` (summary width) defaults to ceil(2/min_fraction); the
    no-false-negative guarantee needs k ≥ 1/min_fraction and the 2×
    slack keeps candidate sets small without risking it."""
    if not 0.0 < min_fraction <= 1.0:
        raise ValueError("min_fraction must be in (0, 1]")
    if k is None:
        k = math.ceil(2.0 / min_fraction)
    if k < math.ceil(1.0 / min_fraction):
        raise ValueError(
            f"k={k} breaks the Misra-Gries guarantee for "
            f"min_fraction={min_fraction}: need k >= {math.ceil(1/min_fraction)}"
        )
    values = df.select(F.col(col).alias("value")).filter(
        F.col("value").isNotNull()
    )
    # ONE summary pass yields both the candidates AND the exact corpus
    # total (per-partition marker rows) — the threshold used to cost a
    # second full count() action over the input. The tiny summary
    # relation (≤ n_partitions × (k+1) rows) is checkpointed eagerly
    # because two branches consume it (candidates broadcast + total);
    # un-checkpointed, each branch would re-run the corpus scan.
    summaries = mg_partition_summaries(
        values, "value", k, with_counts=True
    ).localCheckpoint(eager=True)
    candidates = (
        summaries.filter(F.col("value").isNotNull()).select("value").distinct()
    )
    n_df = summaries.agg(
        F.coalesce(F.sum("n_part"), F.lit(0)).cast("long").alias("_n_total")
    )
    # threshold stays IN the plan (1-row broadcast crossJoin) — same
    # double-multiply-then-ceil arithmetic the Python driver code used,
    # and the same expression the HAVING-count oracle replays
    threshold = F.greatest(
        F.ceil(F.lit(float(min_fraction)) * F.col("_n_total")), F.lit(1)
    )
    return (
        values.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(n_df))
        .filter(F.col("n_occurrences") >= threshold)
        .drop("_n_total")
    )


#: Addressing-scheme version, pinned into incremental sketch state
#: (streaming/sketch_ingest.py): v2 = 8-hex-digit (32-bit) slice.
#: Cells placed under a different version are NOT mergeable — the same
#: key lands in different buckets — so state readers must reject a
#: version mismatch rather than silently undercount.
CM_ADDR_VERSION = 2


def cm_bucket(key: str | Column, depth_row: int, width: int) -> Column:
    """Count-min bucket of ``key`` for hash row ``depth_row`` —
    md5('cm{d}|' + key) first-8-hex-digit arithmetic (a 32-bit value)
    mod ``width``, the same content-addressed construction as
    ``sampling.hash_bucket`` so a SQL oracle can replay every cell
    placement digit by digit (no engine-private hash functions).

    ``width`` may be anything up to 2³¹−1 (the int bucket column); the
    8-digit value space is 2³², so mod bias is ≤ 2⁻³²·width — nil for
    any practical geometry. Per-row expected overcount is the classic
    collision mass E[err] ≤ n/width (n = total key occurrences), min'd
    over ``depth`` rows at readout: width 2²⁰ over a 10¹² -token corpus
    bounds E[err] ≤ ~10⁶ per probe, and P[err > e·n/width] ≤ e^-depth
    (Cormode & Muthukrishnan 2005, §4.1)."""
    if not 1 <= width <= 2**31 - 1:
        raise ValueError("width must be in [1, 2^31 - 1]")
    from .sampling import _hexval

    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"cm{depth_row}|"), c.cast("string")))
    v = F.lit(0).cast("long")
    for j in range(8):
        v = v * 16 + _hexval(F.substring(h, j + 1, 1))
    return (v % F.lit(int(width))).cast("int")


def _cm_placements(key: Column, width: int, depth: int) -> Column:
    """Array of ``depth`` (depth_row, bucket) structs for one key —
    the single-scan form both the builder and the readout explode."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("depth_row"),
                cm_bucket(key, d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def count_min_cells(
    df: DataFrame, col: str, width: int, depth: int, weight_col: str | None = None
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over
    ``col``: ``depth`` hash rows × ``width`` buckets, each cell the
    exact count of keys hashing into it. Returns
    ``(depth_row, bucket, cell_count)`` — ≤ depth×width rows total.

    Scale shape: ONE corpus scan — each key row explodes into its
    ``depth`` (depth_row, bucket) placements map-side (an exploded
    array of structs, not a union of per-depth projections, which
    would re-scan the input depth times) — then a single hash
    aggregate on (depth_row, bucket) with map-side partial combine:
    the shuffle is ≤ n_partitions × depth × width summary rows no
    matter how many distinct keys the corpus holds (the same
    bounded-summary contract as the Misra-Gries builder above). The
    finished sketch is broadcastable state: point-lookup joins against
    it never shuffle the probe side, and two sketches over disjoint
    corpora merge by cell-wise addition (cells are plain sums), which
    is what makes the sketch incrementally maintainable at ingest.

    The md5 placement family is a pure function of the KEY, so the
    builder collapses duplicate keys with one hash aggregate BEFORE
    hashing and weights each distinct key by its occurrence count —
    cell_count = Σ_key count(key)·[key → cell], identical cells, but
    the per-row md5×depth arithmetic runs once per DISTINCT key
    instead of once per occurrence. The collapse shuffle is map-side
    partial-aggregated (bounded by per-partition distinct keys) while
    the hash work drops from O(occurrences) to O(vocabulary) — for a
    token stream that is Heaps-law sublinear at any scale. Callers
    that already hold (key, count) rows pass ``weight_col`` to skip
    the internal collapse and weight cells by that column directly."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if weight_col is None:
        counts = (
            df.select(F.col(col).alias("_key"))
            .filter(F.col("_key").isNotNull())
            .groupBy("_key")
            .agg(F.count("*").alias("_w"))
        )
    else:
        counts = df.select(
            F.col(col).alias("_key"),
            F.col(weight_col).cast("long").alias("_w"),
        ).filter(F.col("_key").isNotNull())
    placements = _cm_placements(F.col("_key"), width, depth)
    return (
        counts.select("_w", F.explode(placements).alias("_p"))
        .select("_w", "_p.depth_row", "_p.bucket")
        .groupBy("depth_row", "bucket")
        .agg(F.sum("_w").alias("cell_count"))
    )


def count_min_estimate(
    keys: DataFrame,
    cells: DataFrame,
    col: str,
    width: int,
    depth: int,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for ``keys[col]`` from a sketch built
    by ``count_min_cells`` with the same (width, depth): the classic
    min-over-rows readout, ``est = min_d cell[d][h_d(key)]``. Estimates
    NEVER undercount (every cell is a superset sum) and overshoot by
    collision mass only — E[err] ≤ n/width per row, min over rows.

    The sketch side is depth×width rows and is broadcast; the probe is
    one scan of the keys relation exploded into ``depth`` placements,
    ``depth`` broadcast-hash lookups per key and one key-grouped min —
    nothing corpus-sized shuffles."""
    stacked = keys.select(
        F.col(col), F.explode(_cm_placements(F.col(col), width, depth)).alias("_p")
    ).select(col, "_p.depth_row", "_p.bucket")
    joined = stacked.join(
        F.broadcast(cells), ["depth_row", "bucket"], "left"
    ).withColumn("_c", F.coalesce(F.col("cell_count"), F.lit(0).cast("long")))
    return joined.groupBy(col).agg(F.min("_c").alias(out_col))


# ---------------------------------------------------------------------------
# HyperLogLog, the ORACLE-REPLAYABLE construction.
#
# Spark's approx_count_distinct is HLL++ with an engine-private hash —
# correct, but unverifiable by an external engine (the one sketch the
# registry carried rows-only through round 5). This variant rebuilds
# classic HLL (Flajolet et al. 2007) from md5 arithmetic, the same
# content-addressed toolbox as cm_bucket/hash_bucket, so DuckDB can
# replay every register and the estimate digit for digit:
#
# - register index = first 2 md5 hex digits of 'hll|'+key  (m=256)
# - w = next 12 hex digits (48 bits); rho = leading-zero count of w
#   within 48 bits + 1 = 49 - bitlength(w)  (w=0 → 49, the cap)
# - Z = Σ_j 2^(-rho_j) over all m registers is accumulated as the
#   EXACT integer Σ 2^(49-rho_j) (empty registers contribute 2^49) —
#   cross-row addition never touches floats, so aggregation order
#   can't flip a bit (the bm25/PQ scaled-BIGINT rule)
# - raw estimate alpha_m·m²·2^49 / Z_scaled is one fixed-order chain
#   of IEEE multiplies/divides on literals and exact integers —
#   bit-identical across engines (verified exhaustively over 100k
#   divisors; mul/div are correctly rounded by IEEE 754, unlike
#   transcendentals)
# - the small-range branch (raw ≤ 2.5m and empty registers exist)
#   needs linear counting m·ln(m/V) — ln() DIVERGES by 1 ulp between
#   JVM and DuckDB for ~7% of the 256 possible arguments (measured),
#   so the table of all 256 values is precomputed ONCE in Python
#   below, embedded as integer literals in BOTH engines' plans, and
#   neither engine ever evaluates ln
#
# Error: rsd ≈ 1.04/√m = 6.5% at m=256 (a cardinality-audit sketch,
# not a billing counter; raise HLL_P for tighter bounds — the
# construction generalizes, only the lc table and alpha change). The
# 48-bit w makes the large-range (hash-collision) correction
# irrelevant below ~2^48 distinct keys.
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P            # 256 registers
HLL_WBITS = 48                # bits of w drawn from the md5
HLL_RHO_CAP = HLL_WBITS + 1   # rho when w == 0
#: 2^49 — the scaled contribution of an EMPTY register (rho = 0).
HLL_Z_ONE = 1 << HLL_RHO_CAP
#: alpha_256 — as the literal expression text so Spark and the SQL
#: oracle build the identical IEEE operation chain.
HLL_ALPHA_SQL = "0.7213 / (1.0 + 1.079 / 256.0)"


def hll_lc_micro_table() -> list[tuple[int, int]]:
    """Linear-counting estimates for every possible empty-register
    count V (1..m), as micro-scaled integers round(m·ln(m/V)·1e6).
    Computed once here — the single source both engines embed as
    literals (ln is NOT evaluated in either engine; see module
    comment)."""
    return [
        (v, round(HLL_M * math.log(HLL_M / v) * 1_000_000))
        for v in range(1, HLL_M + 1)
    ]


def hll_registers(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register relation: ≤ m rows per group,
    ``(group..., bucket, rho_max)``. One corpus scan + one hash
    aggregate keyed by (group, bucket) — the shuffle carries at most
    groups×m rows after map-side combine, independent of cardinality.
    Registers are max-mergeable (max of maxes), the property that
    makes the sketch unionable across shards/batches.

    Duplicate (group, key) rows are collapsed BEFORE hashing: rho is a
    pure function of the key and registers take max(rho), so repeats
    contribute nothing — the md5 + 14-hex-digit arithmetic runs once
    per distinct (group, key) instead of once per occurrence. The
    dedup is a map-side partial-aggregated hash aggregate (shuffle
    bounded by per-partition distinct pairs), strictly cheaper than
    per-occurrence hashing whenever keys repeat at all."""
    gc = list(group_cols or [])
    df = (
        df.filter(F.col(col).isNotNull())
        .select(*gc, *([col] if col not in gc else []))
        .dropDuplicates()
    )
    h = F.md5(F.concat(F.lit("hll|"), F.col(col).cast("string")))
    from .sampling import _hexval

    bucket = (
        _hexval(F.substring(h, 1, 1)) * 16 + _hexval(F.substring(h, 2, 1))
    ).cast("int")
    w = F.lit(0).cast("long")
    for j in range(12):
        w = w * 16 + _hexval(F.substring(h, 3 + j, 1)).cast("long")
    rho = (
        F.when(w == 0, F.lit(HLL_RHO_CAP))
        .otherwise(F.lit(HLL_RHO_CAP) - F.length(F.conv(w, 10, 2)))
        .cast("int")
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(*gc, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gc, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimates from an ``hll_registers`` relation:
    ``(group..., v_empty, z_scaled, approx_count)``. ``z_scaled`` is
    the exact-integer harmonic sum (see module comment); the estimate
    applies the classic small-range linear-counting branch via the
    precomputed table (broadcast join of ≤ m rows). Everything after
    the register relation is bounded by groups×m rows."""
    gc = list(group_cols or [])
    spark = registers.sparkSession
    agg = registers.groupBy(*gc).agg(
        (F.lit(HLL_M) - F.count("*")).cast("int").alias("v_empty"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - rho_max)"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(HLL_Z_ONE)
        ).cast("long").alias("z_scaled"),
    )
    raw = F.expr(
        f"{HLL_ALPHA_SQL} * 65536.0 * 562949953421312.0"
        " / CAST(z_scaled AS DOUBLE)"
    )
    lc = spark.createDataFrame(
        hll_lc_micro_table(), "v_empty int, _lc_micro long"
    )
    linear = (raw <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0)
    return (
        agg.join(F.broadcast(lc), "v_empty", "left")
        .withColumn(
            "approx_count",
            F.when(
                linear, F.col("_lc_micro").cast("double") / F.lit(1.0e6)
            ).otherwise(F.round(raw, 6)),
        )
        .select(*gc, "v_empty", "z_scaled", "approx_count")
    )


def hll_distinct(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Replayable approximate count-distinct of ``col`` per group —
    ``hll_registers`` → ``hll_estimate``."""
    gc = list(group_cols or [])
    return hll_estimate(hll_registers(df, col, gc), gc)


def hll_group_overlap(
    df: DataFrame, group_col: str, col: str
) -> DataFrame:
    """Pairwise distinct-value overlap between groups via HLL register
    algebra — the CARDINALITY complement of the MinHash overlap audit
    (dedup.py:group_minhash_overlap estimates Jaccard; this estimates
    |A|, |B|, |A∪B| and, by inclusion–exclusion, |A∩B|): HLL registers
    are max-mergeable, so the union sketch of any group pair is the
    bucket-wise MAX of the two register relations — no rescan, pure
    sketch algebra (Flajolet et al. 2007 §4: the union estimator is
    exactly the estimator of the merged sketch).

    Returns ``(g_a, g_b, est_a, est_b, est_union, est_intersection)``
    per unordered group pair. ``est_intersection = est_a + est_b −
    est_union`` inherits both sketches' error and can go slightly
    negative for disjoint groups — that is the standard estimator's
    behavior, report it raw (clamping would hide the error bar).

    Scale: ONE corpus scan into the (group, bucket) register relation
    (≤ groups × 256 rows after map-side combine, lazily checkpointed —
    four consumers would otherwise re-scan); the pair-union relation
    is ≤ pairs × 256 rows of bounded metadata; every estimate is the
    shared hll_estimate arithmetic."""
    regs = hll_registers(df, col, [group_col]).localCheckpoint(
        eager=False
    )
    g = group_col
    est = hll_estimate(regs, [g])
    groups = regs.select(g).distinct()
    pairs = (
        groups.select(F.col(g).alias("g_a"))
        .crossJoin(F.broadcast(groups.select(F.col(g).alias("g_b"))))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    ra = pairs.join(
        regs.select(F.col(g).alias("g_a"), "bucket", "rho_max"), "g_a"
    )
    rb = pairs.join(
        regs.select(F.col(g).alias("g_b"), "bucket", "rho_max"), "g_b"
    )
    union_regs = (
        ra.unionByName(rb)
        .groupBy("g_a", "g_b", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    u = hll_estimate(union_regs, ["g_a", "g_b"]).select(
        "g_a", "g_b", F.col("approx_count").alias("est_union")
    )
    ea = est.select(
        F.col(g).alias("g_a"), F.col("approx_count").alias("est_a")
    )
    eb = est.select(
        F.col(g).alias("g_b"), F.col("approx_count").alias("est_b")
    )
    return (
        u.join(F.broadcast(ea), "g_a")
        .join(F.broadcast(eb), "g_b")
        .select(
            "g_a",
            "g_b",
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersection"
            ),
        )
    )
