"""Solo min-of-N probe for one registry query at sf0.1.

Usage: python tools/solo_probe.py <query_name> [n_passes]

Replicates bench.py's measurement protocol (warmup pass + clearCache per
timed pass + noop write) but for a single query, so a regression flagged
from a full-bench capture can be adjudicated on an otherwise-idle JVM.
Prints one JSON line with per-pass times, the min, and loadavg at start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.session import get_spark
from music_streaming_data_pipeline_v2_spark.plans.driver_queries import REGISTRY


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = os.getloadavg()
    if max(load0[0], load0[1]) > 1.5:
        # r7 lesson: load1 ~ 0 right after pytest still means a
        # draining host (load5 carries it); probes then read 1.2x+
        # high. Warn loudly — the probe still runs (forensics), but
        # the number is not comparison-grade.
        print(
            f"WARNING: max(load1, load5) = "
            f"{max(load0[0], load0[1]):.2f} > 1.5 — probe will "
            "measure host load; wait for load5 to drain",
            file=sys.stderr,
        )
    spark = get_spark("solo_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = REGISTRY[name].fn
    # warmup
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    passes = []
    tracker = spark.sparkContext.statusTracker()
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        passes.append(round(time.monotonic() - t0, 3))
    # count jobs for one extra pass via job-group tagging
    spark.catalog.clearCache()
    spark.sparkContext.setJobGroup("probe_count", name)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobGroup("", "")
    jobs = len(tracker.getJobIdsForGroup("probe_count") or [])
    print(
        json.dumps(
            {
                "query": name,
                "passes": passes,
                "min": min(passes),
                "jobs_per_run": jobs,
                "loadavg_at_start": [round(x, 2) for x in load0],
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
