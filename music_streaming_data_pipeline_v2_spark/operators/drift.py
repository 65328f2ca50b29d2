"""Distribution-drift auditing for corpus pipelines.

A 100 TB ingest never arrives in one piece — it lands per source, per
crawl, per day — and the first question after "is it valid?" is "does
this slice look like the corpus we trained the filters on?". The
Population Stability Index is the standard scalar for that (widely
used in model monitoring; see e.g. Siddiqi, "Credit Risk Scorecards",
Wiley 2006, ch. 8): bin a feature, compare each slice's bin shares
``p`` against a reference distribution ``q``, and report
``PSI = Σ_bins (p − q)·ln(p/q)``. Rule-of-thumb thresholds: < 0.1
stable, 0.1–0.25 drifting, > 0.25 shifted.

Implemented as pure DataFrame aggregation: one group×bin count, one
bin count, a broadcast cross of the (tiny) bin inventory onto each
group so EMPTY bins still contribute their smoothed term, and an
integer-summed reduction per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_term_sql(
    cgb: str, ng: str, cb: str, n: str, nb: str, s: float
) -> str:
    """The ONE smoothed ``(p − q)·ln(p/q)`` scaled-BIGINT term — a SQL
    string valid in both Spark SQL and DuckDB, parameterized by the
    four count column names and the bin count. ``psi_drift`` below and
    the DuckDB oracle twin (plans/round5_queries.py:source_drift_psi)
    interpolate THIS function, so the operation order (and therefore
    the pre-rounding double) is identical by construction."""
    p = (
        f"(CAST({cgb} AS DOUBLE) + {s!r})"
        f" / (CAST({ng} AS DOUBLE) + {s!r} * CAST({nb} AS DOUBLE))"
    )
    q = (
        f"(CAST({cb} AS DOUBLE) + {s!r})"
        f" / (CAST({n} AS DOUBLE) + {s!r} * CAST({nb} AS DOUBLE))"
    )
    return f"CAST(ROUND(({p} - {q}) * LN(({p}) / ({q})) * 1e9) AS BIGINT)"


def psi_drift(
    df: DataFrame,
    group_col: str,
    bin_col: str | Column,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-group Population Stability Index of a binned feature
    against the whole-input reference distribution.

    ``bin_col`` is any deterministic integer/string binning expression
    (e.g. ``F.least(F.col("n_chars") / 64, F.lit(8)).cast("int")``).
    Both the group and the reference distributions are Laplace-
    smoothed with ``smoothing`` pseudo-counts per OBSERVED bin —
    smoothing makes PSI total (a bin present in the reference but
    empty in a group contributes a finite term instead of ±∞) and
    deterministic (no data-dependent epsilon). Returns
    ``(group, n_rows, psi)``.

    Engine portability: each bin's ``(p−q)·ln(p/q)`` term is a pure
    function of four exact integers, rounded to 9 dp and summed as a
    scaled BIGINT per group (the bm25_topk playbook) — partition order
    cannot move the result. Scale: ONE scan feeding one (group, bin)
    hash aggregate; the bin marginal, group marginal, and totals are
    re-aggregations of that groups×bins-bounded relation (eagerly
    localCheckpointed — four consumers), and the bin inventory
    broadcasts. Shuffle ∝ groups×bins, never rows.
    """
    # ONE scan: the (group, bin) cell counts; everything downstream is
    # re-aggregation of that tiny (groups×bins-bounded) relation
    cells = bin_cells(df, group_col, bin_col)
    return psi_from_cells(cells, smoothing).withColumnRenamed(
        "grp", group_col
    )


def bin_cells(
    df: DataFrame, group_col: str, bin_col: str | Column
) -> DataFrame:
    """The ``(grp, bin, cnt)`` histogram of one input — the ONE cell
    builder both the batch audit (``psi_drift``) and the streaming
    monitor's per-batch state write (streaming/psi_ingest.py) use, so
    a change to binning semantics (null handling, count type) cannot
    desynchronize the incremental state from the batch audit."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    base = df.select(F.col(group_col).alias("grp"), b.alias("bin")).filter(
        F.col("bin").isNotNull()
    )
    return base.groupBy("grp", "bin").agg(F.count("*").alias("cnt"))


def psi_from_cells(cells: DataFrame, smoothing: float = 1.0) -> DataFrame:
    """PSI per group from a pre-aggregated ``(grp, bin, cnt)`` cell
    relation — the arithmetic core of ``psi_drift``, shared with the
    streaming drift monitor (streaming/psi_ingest.py), whose state IS
    this relation summed across batches: one code path means the
    incremental monitor is exactly the batch audit by construction.
    Returns ``(grp, n_rows, psi)``."""
    cells = (
        cells.select(
            F.col("grp").alias("_grp"),
            F.col("bin").alias("_bin"),
            F.col("cnt").cast("long").alias("_cgb"),
        )
        # bin marginal, group marginal, totals, and the grid below are
        # four consumers of this groups×bins-bounded relation
        .localCheckpoint(eager=True)
    )
    bins = cells.groupBy("_bin").agg(F.sum("_cgb").alias("_cb"))
    groups = cells.groupBy("_grp").agg(F.sum("_cgb").alias("_ng"))
    # totals as one broadcast scalar row (n rows, B observed bins)
    totals = bins.groupBy().agg(
        F.sum("_cb").alias("_n"), F.count("*").alias("_nb")
    )
    s = float(smoothing)
    grid = (
        groups.join(F.broadcast(bins), how="cross")
        .join(cells, ["_grp", "_bin"], "left")
        .withColumn("_cgb", F.coalesce(F.col("_cgb"), F.lit(0)))
        .crossJoin(F.broadcast(totals))
    )
    term = psi_term_sql("_cgb", "_ng", "_cb", "_n", "_nb", s)
    return (
        grid.withColumn("_t", F.expr(term))
        .groupBy("_grp", "_ng")
        .agg(F.sum("_t").alias("_psi_i"))
        .select(
            F.col("_grp").alias("grp"),
            F.col("_ng").alias("n_rows"),
            (F.col("_psi_i").cast("double") / F.lit(1e9)).alias("psi"),
        )
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov statistic of
    ``value_col``'s distribution against the REST of the input — the
    nonparametric sibling of `psi_drift` (no binning choice, no
    smoothing constant): ``KS = max_v |F_g(v) − F_rest(v)|``.

    Exactness: the CDF difference is kept as the cross-multiplied
    INTEGER numerator ``|cum_g·n_rest − cum_rest·n_g|`` — no division
    until the final permille, so the max and the reported statistic
    are exact BIGINT arithmetic on any engine and any partition order.
    (Overflow bound: exact while ``n_g·n_rest < 2⁶³`` ≈ 9.2e18 — fine
    to ~3e9 rows per side; past that, widen to DOUBLE and accept ulp
    ties, or pre-aggregate values into coarser distinct levels.)

    Returns ``(group_col, n_g, n_rest, ks_num, ks_permille)``.

    Scale: one input scan into a (group, value) count relation;
    the value spine × group grid is |groups| × |distinct values| —
    the cumulative windows run over THAT bounded relation (the
    quantiles aggregate-before-window rule), never input rows. For
    continuous features, pre-bucket the value (the caller picks the
    resolution) to bound the distinct-value count."""
    from pyspark.sql import Window

    cnts = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(group_col).alias("g"), F.col(value_col).alias("v")
        )
        .agg(F.count("*").cast("long").alias("c_g"))
    )
    return ks_from_counts(cnts).withColumnRenamed("g", group_col)


def ks_from_counts(cnts: DataFrame) -> DataFrame:
    """The KS arithmetic over a ``(g, v, c_g)`` count relation — the
    shared core of ``ks_drift`` (counts built from rows) and the
    ingest-state readout (psi_ingest.query_ks — counts summed from the
    SAME additive cells PSI stores, so one state serves two drift
    statistics). ``v`` must be ORDERABLE in its true value order: KS
    is a CDF statistic, so integer bins stored as strings must be cast
    back before calling (lexicographic "10" < "2" would corrupt the
    CDF — the readout does this cast; PSI itself never cared)."""
    from pyspark.sql import Window

    allv = cnts.groupBy("v").agg(F.sum("c_g").alias("c_all"))
    groups = cnts.groupBy("g").agg(F.sum("c_g").alias("n_g"))
    total = cnts.agg(F.sum("c_g").alias("n_total"))
    spine = allv.crossJoin(F.broadcast(groups)).crossJoin(
        F.broadcast(total)
    )
    grid = (
        spine.join(cnts, ["g", "v"], "left")
        .withColumn("c_g", F.coalesce("c_g", F.lit(0)))
        .withColumn("c_rest", F.col("c_all") - F.col("c_g"))
        .withColumn("n_rest", F.col("n_total") - F.col("n_g"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = grid.select(
        "g",
        "n_g",
        "n_rest",
        F.abs(
            F.sum("c_g").over(w) * F.col("n_rest")
            - F.sum("c_rest").over(w) * F.col("n_g")
        ).alias("_num"),
    )
    return (
        scored.groupBy("g", "n_g", "n_rest")
        .agg(F.max("_num").alias("ks_num"))
        .select(
            "g",
            "n_g",
            "n_rest",
            "ks_num",
            F.expr("(1000 * ks_num) DIV (n_g * n_rest)").alias(
                "ks_permille"
            ),
        )
    )
