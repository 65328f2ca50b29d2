"""Window-regression guard (VERDICT r3 #8): the driver's correctness
gate only samples the FIRST ``WINDOW`` registry entries, so an oracled
query registered past the window with no prior green CORRECTNESS row
would silently never be driver-verified. This test makes that state
unrepresentable: every oracled entry must either already have a green
driver row in some committed ``CORRECTNESS_r*.json`` or sit inside the
current ``_CHECK_FIRST`` window.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # the driver gate's sample size


def _driver_proven() -> set[str]:
    proven = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("err") is None and row.get("hash_match"):
                    proven.add(name)
    return proven


def test_every_oracled_query_is_driver_proven_or_windowed():
    from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
        REGISTRY,
        finalize_registry,
    )

    # observe the order the DRIVER sees: __spark_entry__ finalizes the
    # window ordering after the whole package imports (registration
    # order depends on which plans module a test session imported
    # first, so the raw dict order here is not the gate's order)
    finalize_registry()
    windowed = set(list(REGISTRY)[:WINDOW])
    proven = _driver_proven()
    missing = [
        name
        for name, entry in REGISTRY.items()
        if entry.oracle is not None
        and name not in proven
        and name not in windowed
    ]
    assert not missing, (
        "oracled queries that will never see the driver gate — rotate "
        f"them into _CHECK_FIRST: {missing}"
    )


# Rows-only entries the CURRENT window may spend gate slots on — each
# needs a reason. A rows-only slot only buys a weaker rows-count driver
# row, so by default they're banned (round-3's two no_oracle rows came
# from exactly that waste); the r6 exception is VERDICT r5 #1/#2's
# explicit ask that the rows-only stale set and the never-checked
# minhash_drop_stats get (re-)checked driver rows this round. Shrink
# this list back toward empty as those rows land.
ROWS_ONLY_WINDOW_ALLOWED: set[str] = set()
# (emptied by the session-2 continuation batch: the rows-only trio the
# r6 window initially carried — minhash_lsh_pairs_docs /
# simhash_pairs_docs / minhash_drop_stats — was displaced by six
# never-checked ORACLED queries, per the window policy that an
# unchecked oracled query outranks a rows-only re-check whose oracled
# sibling is windowed or already proven.)


def test_window_is_exactly_the_gate_sample():
    """_CHECK_FIRST must fill the whole gate window, and any rows-only
    entry inside it must carry an explicit justification in
    ``ROWS_ONLY_WINDOW_ALLOWED``."""
    from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
        _CHECK_FIRST,
        REGISTRY,
    )

    assert len(_CHECK_FIRST) == WINDOW
    assert len(set(_CHECK_FIRST)) == WINDOW
    rows_only = [
        n
        for n in _CHECK_FIRST
        if REGISTRY[n].oracle is None and n not in ROWS_ONLY_WINDOW_ALLOWED
    ]
    assert not rows_only, f"rows-only entries waste gate slots: {rows_only}"


def test_queries_md_matches_registry():
    """QUERIES.md is generated (tools/gen_queries_md.py) — this pins it
    to the live registry so catalog and registry cannot drift (VERDICT
    r4 #8): the stated counts must match, and every registry query must
    have a catalog row with the right oracle kind."""
    import os
    import re

    from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
        REGISTRY,
    )

    path = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    with open(path) as fh:
        md = fh.read()
    m = re.search(r"(\d+)\s+queries, (\d+) with DuckDB oracle twins", md)
    assert m, "QUERIES.md header lost its counts line — regenerate"
    n, n_oracle = int(m.group(1)), int(m.group(2))
    assert n == len(REGISTRY), (
        f"QUERIES.md says {n} queries, registry has {len(REGISTRY)} — "
        "run: python tools/gen_queries_md.py"
    )
    want_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert n_oracle == want_oracle, (
        f"QUERIES.md says {n_oracle} oracled, registry has {want_oracle} — "
        "run: python tools/gen_queries_md.py"
    )
    rows = dict(re.findall(r"^\| `(\w+)` \| (SQL|rows-only) \|", md, re.M))
    for name, q in REGISTRY.items():
        kind = "SQL" if q.oracle is not None else "rows-only"
        assert rows.get(name) == kind, (
            f"{name}: QUERIES.md row {rows.get(name)!r} != registry "
            f"{kind!r} — run: python tools/gen_queries_md.py"
        )
