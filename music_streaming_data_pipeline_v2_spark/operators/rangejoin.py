"""Banded range join: pairs within a time distance, without a
nested-loop theta join.

SURVEY §2.3 lists theta/range/interval joins as absent from the
reference; this adds the band variant (|l.ts − r.ts| ≤ band) — the
workhorse for proximity analytics (events near events, trades near
quotes two-sided).

Spark-first plan: a naive ``l.join(r, abs(l.ts - r.ts) <= band)`` has
no equi-key, so Spark falls back to BroadcastNestedLoopJoin /
CartesianProduct — O(|L|·|R|) comparisons and a driver-killer at scale.
Instead, quantize time into band-width chunks: a pair within ``band``
is always in the same or adjacent chunk, so joining on chunk equality
(with the left side exploded to [chunk−1, chunk, chunk+1]) is a plain
hash equi-join whose per-key fan-out is bounded by chunk occupancy —
then the exact band predicate filters residual false candidates.
Cost: 3× left-side rows through one shuffle, versus |L|·|R| compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
    extra_key: str | None = None,
) -> DataFrame:
    """All (left, right) pairs with |left_ts − right_ts| ≤ band_seconds
    (optionally also matching on ``extra_key``). Returns left columns +
    right columns (right's renamed with an ``r_`` prefix on collision).
    """
    band_us = band_seconds * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    overlap = set(left.columns) & set(right.columns)
    right_renamed = right
    for c in overlap:
        right_renamed = right_renamed.withColumnRenamed(c, f"r_{c}")
    r_ts_col = f"r_{right_ts}" if right_ts in overlap else right_ts
    r_us = F.unix_micros(F.col(r_ts_col).cast("timestamp"))

    # chunk ids via INTEGER division (float division drifts at ulp
    # scale near chunk boundaries and could drop edge pairs)
    l_tagged = left.withColumn("_us", l_us).withColumn(
        "_chunk", F.explode(F.array(*[
            F.expr(f"_us div {band_us}") + d for d in (-1, 0, 1)
        ]))
    )
    r_tagged = right_renamed.withColumn("_r_us", r_us).withColumn(
        "_chunk", F.expr(f"_r_us div {band_us}")
    )

    keys = ["_chunk"] + ([extra_key] if extra_key else [])
    joined = l_tagged.join(r_tagged, keys).filter(
        F.abs(F.col("_us") - F.col("_r_us")) <= band_us
    )
    return joined.drop("_chunk", "_us", "_r_us")
