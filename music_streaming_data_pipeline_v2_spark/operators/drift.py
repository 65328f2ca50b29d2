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
