"""Regenerate QUERIES.md from the query REGISTRY docstrings."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.plans.driver_queries import REGISTRY


def main() -> None:
    n = len(REGISTRY)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    lines = [
        "# QUERIES — the driver-contract query catalog",
        "",
        f"Auto-generated from `plans/driver_queries.py` (REGISTRY). {n} "
        f"queries, {n_oracle} with DuckDB oracle twins (hash-exact at "
        "sf0.001 / sf0.01 / sf0.1), the rest rows-only (engine-specific "
        "hashing) with oracled siblings.",
        "",
        "| query | oracle | what it proves |",
        "|---|---|---|",
    ]
    for name, q in REGISTRY.items():
        doc = " ".join((q.fn.__doc__ or "").split())
        if len(doc) > 160:
            doc = doc[:157].rstrip() + "..."
        kind = "SQL" if q.oracle is not None else "rows-only"
        lines.append(f"| `{name}` | {kind} | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n} queries ({n_oracle} oracled)")


if __name__ == "__main__":
    main()
