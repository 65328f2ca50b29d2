"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row (key, ts) attach the most recent right row with the
same key and right_ts ≤ ts (backward direction, inclusive) — the
standard operator for joining measurements to slowly-changing state
(price as of trade time, user setting as of event time).

Spark-first implementation — the union/window technique, NOT a range
self-join:

1. Tag both sides and union them on (key, ts): right rows carry their
   payload in a struct, left rows carry null payload.
2. One window per key ordered by (ts, side) computes
   ``last_value(payload, ignoreNulls=true)`` up to the current row —
   i.e. the latest right payload at-or-before each row. Right sorts
   before left at equal ts, making the match inclusive.
3. Keep the left rows; unpack the struct.

Cost: ONE shuffle on the key (the window), sorting within partitions —
same asymptotics as a sort-merge join and robust to arbitrary time
distributions. A naive theta-join (l.key = r.key AND r.ts <= l.ts) +
max-per-group would shuffle the full cross-product per key; never do
that. (Range-join-bucketing is the alternative when the right side is
huge and the lookback is bounded: bucket by time chunk and join each
left chunk to its and the previous chunk.)

Determinism: with duplicate right (key, ts) rows, ``tie_col`` orders
them and the LAST wins; pass a unique column for stable results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: left ⟕ latest right at-or-before.

    Returns all left columns plus the right ``payload_cols`` (null when
    no right row precedes the left row).

    Null handling: right rows with a null ``right_ts`` are dropped —
    ascending sort is NULLS FIRST, so they would otherwise sort before
    every real row and become the "match" for left rows that should
    get none (this project's own coerce_timestamp produces such nulls).
    Left rows with a null ``left_ts`` are kept with a null payload
    (they precede every right row in the sort, so nothing matches).

    ``payload_cols`` may not collide with left column names — the
    output would contain two columns with the same name, poisoning
    every later reference with AMBIGUOUS_REFERENCE; rename or project
    one side first.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"payload columns collide with left columns: {clash}; "
            "rename or select around them before the as-of join"
        )

    right = right.filter(F.col(right_ts).isNotNull())
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None)
        .cast(r_tagged.schema["_payload"].dataType)
        .alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    ordering = [F.col("_ts").asc(), F.col("_is_right").desc()]
    if tie_col is not None:
        # duplicate right timestamps: order so the last by tie_col wins
        r_tagged = r_tagged.withColumn("_tie", F.col(f"_payload.{tie_col}"))
        l_tagged = l_tagged.withColumn("_tie", F.lit(None).cast(
            r_tagged.schema["_tie"].dataType
        ))
        ordering.append(F.col("_tie").asc_nulls_last())

    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    ).filter(F.col("_is_right") == 0)

    out = matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )
    return out


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    min_overlap_seconds: int = 0,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Interval overlap self-join — which intervals intersect which —
    with range-bucket blocking. The naive form is a cross join with an
    overlap predicate (``a.start <= b.end AND b.start <= a.end``),
    which Catalyst can only execute as a nested loop: O(n²) at any
    scale. Instead each interval EXPLODES into the fixed-width time
    buckets it spans, candidates join on bucket equality (a hash
    join), the overlap predicate verifies exactly, and DISTINCT
    collapses pairs that share several buckets. Result-identical to
    the naive join (two intervals overlap iff they co-occupy at least
    one bucket covering their intersection) — the accelerator-
    equivalence contract — with shuffle ∝ Σ interval-spans/bucket,
    never n².

    Intervals are epoch-second longs; ``bucket_seconds`` trades
    per-row fan-out (long intervals explode into more buckets) against
    per-bucket candidate density — size it near the median interval
    length. Returns one row per unordered pair
    ``(id_a, id_b, overlap_seconds)`` with ``id_a < id_b`` and
    inclusive-bound overlap ≥ ``min_overlap_seconds``.

    ``max_buckets_per_interval`` is the poison-row guard: a single
    malformed interval (epoch-0 sentinel start, a year-long span with
    a mis-sized bucket) would otherwise explode into millions of
    bucket rows — or hit Spark's sequence-length limit — and sink the
    whole job. Any row whose span exceeds the cap fails the query
    with a raise_error naming the offending id (loud by design:
    silently dropping it would change pair semantics; callers that
    WANT to skip such rows should pre-filter on
    ``(end-start) DIV bucket_seconds``).
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).filter(F.col("_s") <= F.col("_e"))
    b = int(bucket_seconds)
    cap = int(max_buckets_per_interval)
    span = F.expr(f"_e DIV {b}") - F.expr(f"_s DIV {b}") + F.lit(1)
    # the guard feeds _s itself (not a dropped side column, which
    # Catalyst's column pruning would erase along with the check)
    base = base.withColumn(
        "_s",
        F.when(
            span > cap,
            F.raise_error(
                F.concat(
                    F.lit("interval_overlap_pairs: interval id="),
                    F.col("_id").cast("string"),
                    F.lit(
                        f" spans more than {cap} buckets of {b}s — "
                        "malformed bounds or bucket_seconds mis-sized; "
                        "pre-filter or raise max_buckets_per_interval"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("_s")),
    )
    bucketed = base.select(
        "_id",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.expr(f"_s DIV {b}"), F.expr(f"_e DIV {b}"), F.lit(1)
            )
        ).alias("_bkt"),
    )
    left = bucketed.select(
        F.col("_bkt"),
        F.col("_id").alias("id_a"),
        F.col("_s").alias("_sa"),
        F.col("_e").alias("_ea"),
    )
    right = bucketed.select(
        F.col("_bkt"),
        F.col("_id").alias("id_b"),
        F.col("_s").alias("_sb"),
        F.col("_e").alias("_eb"),
    )
    overlap = F.least("_ea", "_eb") - F.greatest("_sa", "_sb") + F.lit(1)
    return (
        left.join(right, "_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("_sa") <= F.col("_eb")) & (F.col("_sb") <= F.col("_ea"))
        )
        .select("id_a", "id_b", overlap.alias("overlap_seconds"))
        .filter(F.col("overlap_seconds") >= int(min_overlap_seconds))
        .distinct()
    )
