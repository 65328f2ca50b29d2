"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, sorted column
names, and values (exact for non-floats; exact-or-1e-9-relative for
floats, reporting which). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from music_streaming_data_pipeline_v2_spark.schemas import TESTDATA_TABLES
from music_streaming_data_pipeline_v2_spark.session import get_spark

import __spark_entry__ as entrymod


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(tbl) -> list[tuple]:
    """Arrow table → column-name-sorted, row-sorted stringified tuples."""
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [
        tuple(str(v) for v in r) for r in zip(*(c.to_pylist() for c in tbl.columns))
    ]
    return sorted(rows)


def compare(name: str, spark_tbl, duck_tbl) -> bool:
    ok = True
    if spark_tbl.num_rows != duck_tbl.num_rows:
        print(f"  ROWS MISMATCH: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
        ok = False
    sc = sorted(spark_tbl.column_names)
    dc = sorted(duck_tbl.column_names)
    if sc != dc:
        print(f"  COLS MISMATCH: spark={sc} duck={dc}")
        return False
    s_types = {c: str(spark_tbl.schema.field(c).type) for c in sc}
    d_types = {c: str(duck_tbl.schema.field(c).type) for c in dc}
    for c in sc:
        if s_types[c] != d_types[c]:
            print(f"  TYPE NOTE {c}: spark={s_types[c]} duck={d_types[c]}")
    if not ok:
        return False
    s_rows, d_rows = normalize(spark_tbl), normalize(duck_tbl)
    exact = s_rows == d_rows
    if exact:
        print(f"  OK exact ({len(s_rows)} rows)")
        return True
    # diagnose: approx-compare cell-wise after row sort
    diffs = 0
    for sr, dr in zip(s_rows, d_rows):
        for a, b in zip(sr, dr):
            if a == b:
                continue
            try:
                fa, fb = float(a), float(b)
                if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12):
                    continue
            except ValueError:
                pass
            if diffs < 5:
                print(f"    cell diff: spark={a!r} duck={b!r}")
            diffs += 1
    if diffs == 0:
        print(f"  CLOSE but not string-exact ({len(s_rows)} rows) — float formatting or ulp drift")
    else:
        print(f"  VALUE MISMATCH: {diffs} differing cells")
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        print(f"[{name}]")
        spark_tbl = fn(spark, sf_dir).toArrow()
        if name not in oracles:
            print(f"  rows-only: {spark_tbl.num_rows} rows")
            continue
        duck_tbl = con.execute(oracles[name]).arrow()
        if not compare(name, spark_tbl, duck_tbl):
            failed.append(name)
    print("\nFAILED:" if failed else "\nALL OK", failed if failed else "")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
