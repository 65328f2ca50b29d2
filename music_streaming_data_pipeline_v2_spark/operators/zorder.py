"""Z-order (Morton) layout for multi-dimensional scan pruning.

The KV serving layout (operators/serving.py) sorts by (pk, sk), which
makes pk-equality prune files and sk-ranges prune row groups — but a
predicate on a SECOND independent dimension (e.g. date when sorted by
user, or user when sorted by date) touches every file. Interleaving
the bits of both keys into one Morton code and sorting by THAT bounds
every file to a small hyper-rectangle of the key space, so min/max
zone maps prune scans for predicates on EITHER dimension — the
technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` and the classic
Morton/Z-curve literature (Morton 1966; Orenstein & Merrett, PODS'84).

Everything here is pure integer arithmetic on built-in expressions:
the z-value assembles as a flat SQL string (shift/mask/or per bit —
whole-stage-codegen'd, engine-portable for DuckDB oracle replay), the
layout is `repartitionByRange(zvalue)` + `sortWithinPartitions` — the
standard write-side pattern that gives each output file a contiguous
z-range. No shuffle beyond the one range exchange any sorted write
pays.

The layout guarantee tested (tests/test_zorder.py): after a z-ordered
write, each file's (x, y) min/max box covers a bounded fraction of
both dimensions' global ranges — a linearly-sorted write bounds only
its leading dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """Morton code of two non-negative int expressions, ``bits`` bits
    each, as one flat SQL expression: even bit positions carry ``x``,
    odd carry ``y``. Callers must pre-reduce inputs into [0, 2^bits)
    — out-of-range bits are simply ignored (masked per-bit), which
    keeps the expression total rather than throwing mid-scan."""
    if not 1 <= bits <= 31:
        # 2*bits interleaved bits must fit a signed BIGINT (and a
        # shift count ≥ 64 is undefined-ish across engines)
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zvalue(x: str, y: str, bits: int = 16) -> Column:
    return F.expr(zvalue_sql(x, y, bits))


def zorder_layout(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Return ``df`` laid out for writing in z-order on (x, y):
    range-partitioned and sorted by the Morton code, so each output
    file covers one contiguous z-range = one bounded rectangle of the
    key space. Write with plain ``.write.parquet`` — file-level
    min/max stats on BOTH columns become selective.

    ``n_files`` pins the partition (→ file) count; default keeps the
    session's shuffle parallelism. The z column is dropped before the
    caller writes — parquet zone maps on x and y themselves are what
    pruning consumes."""
    z = zvalue(x, y, bits).alias("_z")
    parted = (
        df.repartitionByRange(n_files, z)
        if n_files is not None
        else df.repartitionByRange(z)
    )
    return parted.sortWithinPartitions(zvalue(x, y, bits))
