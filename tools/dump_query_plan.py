"""Dump one registry query's .explain('formatted') to plans/r10/.

Usage: python tools/dump_query_plan.py <before|after> <query> [query...]

Writes plans/r10/<query>_<tag>.txt with the same header convention the
round-9 optimization evidence uses (sf0.01 — plan shape, not timing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.session import get_spark
from music_streaming_data_pipeline_v2_spark.plans.driver_queries import REGISTRY


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump_query_plan")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    os.makedirs(out_dir, exist_ok=True)
    word = "BEFORE" if tag == "before" else "AFTER"
    import contextlib
    import io

    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — explain('formatted') {word} round-9 "
                "optimization (sf0.01)\n"
            )
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
