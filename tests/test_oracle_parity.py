"""Every registry query verified against its DuckDB oracle at sf0.001.

ADVICE r2 (pipeline_queries.py finding): queries registering past the
driver gate's 50-slot window had no automatic verification — neither the
driver nor any pytest exercised them. This parametrized suite closes the
hole structurally: every ``queries()`` entry with an ``oracle_sql()``
twin is row/schema/value-exact-checked on each pytest run regardless of
registration position, and every rows-only entry is at least executed.
Mirrors the driver's compare (tools/check_oracle.py): column-name-sorted,
row-sorted, stringified exact equality — no float tolerance.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import duck_connect, normalize

SF = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_tbl = _QUERIES[name](spark, SF).toArrow()
    duck_tbl = duck.execute(_ORACLES[name]).arrow()
    assert spark_tbl.num_rows == duck_tbl.num_rows, (
        f"rows: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}"
    )
    assert sorted(spark_tbl.column_names) == sorted(duck_tbl.column_names)
    s_rows, d_rows = normalize(spark_tbl), normalize(duck_tbl)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        pytest.fail(f"value mismatch ({len(s_rows)} rows); first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(spark, name):
    # No SQL-expressible oracle (seeded LSH / HLL sketch / engine-computed
    # codebooks) — still must execute and return a stable schema.
    tbl = _QUERIES[name](spark, SF).toArrow()
    assert tbl.num_rows >= 0
    assert tbl.column_names
