"""Deterministic shard assignment — rendezvous (highest-random-weight)
hashing for distributing a corpus across N training workers.

The 100 TB problem this solves: a corpus must be split into N worker
shards such that (a) assignment is a pure function of document identity
(re-runs, retries, and independent jobs agree without coordination),
(b) load is uniform, and (c) when the worker count changes N → N+1,
only ~1/(N+1) of documents move (modulo hashing ``hash(id) % N``
reshuffles EVERYTHING — the classic incremental-retraining footgun:
every worker's cached shard invalidates). Rendezvous hashing
(Thaler & Ravishankar 1996) gives minimal disruption without the ring
metadata of consistent hashing: shard(d) = argmax_s md5(salt|s|d).

Cross-engine determinism: the per-(shard, doc) weight is the md5 hex
string itself — lowercase hex compares identically (lexicographic ==
numeric) in every engine — and ties (astronomically unlikely 128-bit
collisions) break toward the larger shard index, making the argmax
total. The DuckDB oracle replays the same strings via a shard
cross-join + ROW_NUMBER, so a driver hash-match proves the map-only
argmax form ≡ the relational form.

Scale: the assignment is ONE map-only expression per row — an N-element
literal struct array reduced with ``array_max``; no shuffle, no join,
fully codegen. Linear in N per row: fine for worker counts (N ≤ ~10³).
For N beyond codegen comfort (~10⁴ struct literals), compose two
levels (rendezvous to √N groups, then within-group) — same math, two
map-only stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "rendezvous_shard",
    "rendezvous_assign",
    "shard_movement",
]

#: Salt prefix decorrelating the shard coin from every other md5 use
#: of the same id column (see sampling.hash_bucket's salt discipline).
_SALT = "hrw|"


def rendezvous_shard(
    id_col: str | Column, n_shards: int, salt: str = _SALT
) -> Column:
    """Column: the HRW shard index (0..n_shards-1) for ``id_col``.

    weight(s, d) = md5(f"{salt}{s}|{d}") — the shard index is INSIDE
    the digest input (not appended to the output), so per-shard weight
    streams are mutually independent coins; shard = argmax by
    (weight, shard index).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(id_col).cast("string") if isinstance(id_col, str) else (
        id_col.cast("string")
    )
    entries = [
        F.struct(
            F.md5(F.concat(F.lit(f"{salt}{s}|"), key)).alias("h"),
            F.lit(s).alias("shard"),
        )
        for s in range(int(n_shards))
    ]
    return F.array_max(F.array(*entries))["shard"]


def rendezvous_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
    salt: str = _SALT,
) -> DataFrame:
    """Input columns plus the HRW ``shard_col`` (map-only, no shuffle)."""
    return df.withColumn(
        shard_col, rendezvous_shard(id_col, n_shards, salt)
    )


def shard_movement(
    df: DataFrame,
    id_col: str,
    n_before: int,
    n_after: int,
    salt: str = _SALT,
) -> DataFrame:
    """One-row relation auditing the resize n_before → n_after:
    ``n_total``, ``n_moved`` (ids whose HRW shard changed) and
    ``moved_permille`` (exact integer ``1000·moved DIV total``).

    The minimal-disruption contract under test: growing N → N+1 moves
    exactly the ids whose NEW shard's weight exceeds every old one —
    in expectation n/(N+1) — against 1 − 1/(N+1) for modulo hashing.
    Both assignments are map-only expressions over one scan; the audit
    aggregate is a single global sum.
    """
    before = rendezvous_shard(id_col, n_before, salt)
    after = rendezvous_shard(id_col, n_after, salt)
    moved = F.sum((before != after).cast("long")).alias("n_moved")
    return df.agg(
        F.count(F.lit(1)).alias("n_total"),
        moved,
    ).select(
        "n_total",
        "n_moved",
        F.expr("1000 * n_moved DIV n_total").alias("moved_permille"),
    )
