"""Top-K per group via ranking windows (reference W1/W2 + P7/T1).

Reference: ``row_number() over (partition by keys order by count desc)``
then ``rank <= K`` (glue_jobs/music-streaming-transform.py:126-130,
150-153). ``row_number`` with a non-unique ordering breaks ties
arbitrarily — nondeterministic across runs/engines — so this engine
ALWAYS appends deterministic tie-break columns to the ordering
(SURVEY.md §2.5 note); oracle comparisons then hash-match.

Scale note: a ranking window shuffles on the partition keys and sorts
within each. For top-K per group that is the right plan when groups are
many and small (genre×date). If one group is huge/skewed, pre-aggregate
to the item grain first (the callers here always rank an already
aggregated count table, so window input is |groups|×|items| not raw
events) — this is the partial-topK-then-final shape; AQE skew-split
handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    k: int,
    tie_break_cols: list[str] | None = None,
    rank_alias: str = "rank",
    descending: bool = True,
) -> DataFrame:
    """Rank rows within each partition and keep the top K."""
    ordering: list[Column] = [
        F.desc(order_col) if descending else F.asc(order_col)
    ]
    for c in tie_break_cols or []:
        ordering.append(F.asc(c))
    w = Window.partitionBy(*partition_cols).orderBy(*ordering)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= k
    )
