"""Skew mitigation: salted two-phase aggregation and bucketed joins.

SCALE.md techniques made concrete. At 100 TB a handful of hot keys
(one viral genre-day, one boilerplate shingle bucket) can pin a whole
stage on one task. Two standing answers:

- **Salting**: append a random salt to the hot group key, aggregate at
  (key, salt) — the hot key's rows spread over ``n_salts`` tasks —
  then re-aggregate at the key. Works for any algebraic aggregate
  (count/sum/min/max; avg as sum+count). AQE's skew handling covers
  *join* skew automatically; aggregation skew still wants salting
  because the partial aggregate itself is the hot spot.
- **Bucketing**: pre-shuffle both sides of a recurring big⋈big join
  into the same bucket layout (``bucketBy`` on the join key) so the
  join runs zipped, exchange-free, every time it's used.

Both preserve results exactly — tests assert equality with the
unsalted/unbucketed plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a uniform salt.

    ``aggs``: output_name → (input_col_or_*, fn) with fn ∈
    {count, sum, min, max}. The partial phase computes per-(key, salt);
    the final phase merges partials with the fn's combiner (count→sum).
    Deterministic results (identical to direct groupBy) regardless of
    the salt distribution, which only affects placement.
    """
    combiner = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )

    def agg_expr(col: str, fn: str) -> Column:
        if fn == "count":
            return F.count("*") if col == "*" else F.count(col)
        return getattr(F, fn)(col)

    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[agg_expr(col, fn).alias(name) for name, (col, fn) in aggs.items()]
    )
    final = partial.groupBy(*group_cols).agg(
        *[
            getattr(F, combiner[fn])(name).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Replicate-and-salt inner equi-join for skewed join keys.

    The big (skewed) side gets a uniform salt in ``[0, n_salts)``; the
    small side is replicated once per salt value (``explode`` of the
    full salt range) so every (key, salt) pair on the big side finds
    its match. The shuffle key becomes (key, salt): a hot key's rows
    spread over ``n_salts`` tasks instead of pinning one. The result is
    exactly the plain inner join — the salt only affects placement.

    AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``)
    handles most cases automatically at runtime; explicit salting
    remains the answer when AQE is off, when one key alone exceeds
    what a split partition can hold, or when the small side must stay
    a shuffle join (too big to broadcast, too hot to leave unsalted).
    Replication cost: ``n_salts ×`` the small side — size accordingly.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, [key, "_salt"], "inner").drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a relation bucketed (and optionally sorted) by its join
    key. Subsequent equi-joins between tables bucketed identically on
    the key run WITHOUT a shuffle (SortMergeJoin over pre-bucketed
    scans — verify: no Exchange above either scan in ``.explain``).

    Single-column convenience form of — and delegate to — the ONE
    bucketed writer, ``io.sinks.write_bucketed`` (multi-column keys,
    external paths, modes; plan-asserted shuffle-free joins in
    tests/test_bucketed.py)."""
    from ..io.sinks import write_bucketed as _write_bucketed

    _write_bucketed(
        df,
        table_name,
        [bucket_col],
        n_buckets,
        sort_by=[sort_col] if sort_col else None,
    )


def key_skew_audit(
    df: DataFrame, key_col: str, k: int = 10
) -> DataFrame:
    """Top-``k`` heaviest keys with exact integer skew statistics —
    the measurement that decides whether a join/aggregate on this key
    needs the salting operators above (or AQE's skew split) BEFORE the
    shuffle runs at 100 TB: ``share_permille`` = the key's share of
    all rows, ``skew_permille`` = 1000 × n / (total / n_keys), i.e.
    how many "fair shares" the key holds (1000 = perfectly uniform).

    Returns ``(key_col, n_rows, share_permille, skew_permille, rank)``.

    Scale: one input scan into the per-key count relation; total and
    key-count are aggregates OVER it (1-row broadcast); the top-k cut
    is orderBy().limit() — TakeOrderedAndProject per-partition heaps,
    never a full sort (the dsir_gumbel_topk rule)."""
    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").cast("long").alias("_n_keys"),
    )
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc(key_col))
        .limit(k)
        .crossJoin(F.broadcast(stats))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc(key_col))
    return (
        top.withColumn(
            "share_permille", F.expr("(1000 * n_rows) DIV _total")
        )
        .withColumn(
            "skew_permille",
            F.expr("(1000 * n_rows * _n_keys) DIV _total"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(key_col, "n_rows", "share_permille", "skew_permille", "rank")
    )
