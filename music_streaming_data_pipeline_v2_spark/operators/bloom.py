"""Broadcast Bloom filters as pure Spark SQL expressions.

Spark's own Bloom machinery (`bloom_filter_agg` / `might_contain`) is
internal — not on the public function search path in Spark 4.1 — and
`DataFrameStatFunctions` Bloom filters live driver-side as Java
objects a SQL expression can't consume. This module builds the same
structure out of public primitives so it stays inside whole-stage
codegen:

- **build** (distributed): k seeded ``xxhash64`` probes per value →
  bit positions → ``groupBy(word) → bit_or`` — a shuffle of at most
  ``num_bits/64`` rows regardless of input size — then collect the
  tiny word array (m = 2^20 bits ⇒ 16K longs ⇒ 128 KB).
- **probe** (map-side): the word array ships as a ONE-ROW broadcast
  relation whose attribute the k probe expressions reference (an
  inline literal gets constant-propagated into every probe and the
  optimizer then re-walks k copies of it — see with_bloom_contains),
  and membership is ``element_at`` + ``shiftright`` + mask — no
  shuffle of the probed side, no Python.

The 100 TB use case is decontamination-style anti-joins where one
side is small (a test set's n-grams) and the other is the corpus:
instead of shuffling every corpus gram to the join, the corpus scan
drops ≥ ~99% of grams map-side (false-positive rate ``fpp``) and only
survivors shuffle. A Bloom filter has **no false negatives** — every
true hit survives the prefilter — so `exact verification after the
prefilter returns results identical to the unfiltered join` (the
property `ngram_contamination_bloom`'s oracle hash-checks).

Sizing formulas are the standard Bloom optima (k = (m/n)·ln2,
m = −n·ln(fpp)/ln²2) as published in Bloom's 1970 CACM paper and
every open implementation since.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def optimal_num_bits(n_items: int, fpp: float = 0.01) -> int:
    """Standard optimum m = ceil(−n·ln(p) / ln(2)²), floored at 64."""
    if n_items <= 0:
        return 64
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    return max(64, m)


def optimal_num_hashes(num_bits: int, n_items: int) -> int:
    """Standard optimum k = round((m/n)·ln 2), clamped to [1, 16]."""
    if n_items <= 0:
        return 1
    k = round(num_bits / n_items * math.log(2))
    return min(16, max(1, k))


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k probe positions for one value: pmod(xxhash64(v, seed), m).
    Seeding via a second hashed argument (not re-hashing the output)
    keeps the k probes independent; pmod (not %) keeps negative hashes
    in [0, m)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame, col: str, num_bits: int, num_hashes: int
) -> list[int]:
    """Build the filter distributed and return its words (list of
    ``num_bits/64`` signed 64-bit ints, LSB-first within each word).

    One narrow job: explode each value to its k positions (map-side),
    aggregate ``bit_or`` by word index — the shuffle carries at most
    one row per distinct word, i.e. ≤ m/64 rows total independent of
    corpus size — and collect the words. The collect is bounded by the
    filter size the caller chose, never by the data."""
    c = F.col(col)
    pos = F.explode(F.array(*_positions(c, num_bits, num_hashes))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.expr("pos DIV 64").cast("int").alias("w"),
            # call_function: the classic shiftleft binding only takes a
            # Python int for numBits; the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * ((num_bits + 63) // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def with_bloom_contains(
    df: DataFrame,
    col: str,
    words: list[int],
    num_bits: int,
    num_hashes: int,
    out_col: str = "_bloom_hit",
) -> DataFrame:
    """Append a boolean column: value *might* be in the filter (no
    false negatives; false positives at the built fpp).

    The words ship as a ONE-ROW broadcast relation the probes
    reference as an attribute, not as an inline literal: planting a
    literal array gets constant-propagated into every probe by
    CollapseProject, after which each optimizer rule application
    re-walks k copies of an m/64-element array — measured as seconds
    of driver-side plan time at m≈250k bits. A BroadcastNestedLoopJoin
    against one row costs nothing at runtime and keeps exactly one
    copy of the filter in the plan. All probe expressions are
    built-ins — the probe itself stays inside whole-stage codegen,
    and the big side never shuffles."""
    if out_col in df.columns:
        raise ValueError(
            f"with_bloom_contains: out_col {out_col!r} already exists on "
            "the input — pass a different out_col"
        )
    # uniquified internal name: a caller frame already carrying the
    # broadcast side's column would otherwise hit an ambiguous
    # reference or silently shadow it (ADVICE r4)
    bf_col = "_bf_words"
    while bf_col in df.columns:
        bf_col += "_"
    c = F.col(col)
    bf = df.sparkSession.createDataFrame(
        [(list(words),)],
        T.StructType(
            [T.StructField(bf_col, T.ArrayType(T.LongType(), False), False)]
        ),
    )
    probes = []
    for p in _positions(c, num_bits, num_hashes):
        word = F.element_at(F.col(bf_col), (p / 64).cast("int") + 1)
        bit = F.call_function("shiftright", word, (p % 64).cast("int")).bitwiseAND(
            F.lit(1)
        )
        probes.append(bit == 1)
    return (
        df.join(F.broadcast(bf))
        .withColumn(out_col, reduce(lambda a, b: a & b, probes))
        .drop(bf_col)
    )


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    col: str,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> DataFrame:
    """Keep only ``big`` rows whose ``col`` *might* appear in
    ``small``'s ``col`` — the map-side candidate cut in front of an
    exact join.

    ``n_items`` sizes the filter; when omitted it is measured with one
    count_distinct job over ``small`` (the SMALL side by contract —
    at 100 TB that's the test set, never the corpus). Downstream MUST
    still verify candidates exactly (join/semi-join against ``small``)
    — the guarantee is only no-false-negatives, which is what makes
    `prefilter + exact verify ≡ exact join` and therefore
    oracle-checkable."""
    if n_items is None:
        n_items = small.select(F.count_distinct(F.col(col))).first()[0]
    m = optimal_num_bits(n_items, fpp)
    k = optimal_num_hashes(m, n_items)
    words = build_bloom(small, col, m, k)
    # uniquified hit column: ``big`` may legitimately carry _bloom_hit
    # from an earlier prefilter pass (ADVICE r4)
    hit = "_bloom_hit"
    while hit in big.columns:
        hit += "_"
    flagged = with_bloom_contains(big, col, words, m, k, out_col=hit)
    return flagged.filter(F.col(hit)).drop(hit)
