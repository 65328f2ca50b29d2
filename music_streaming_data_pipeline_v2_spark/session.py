"""SparkSession factory.

One place to encode the engine's execution-model choices so every entry
point (tests, bench, driver contract, streaming) runs with the same plan
environment:

- AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
  broadcast) — the 100 TB story depends on it.
- ``spark.sql.shuffle.partitions`` sized for the local test harness; on a
  real cluster AQE coalesces these anyway.
- Arrow enabled for the Pandas-UDF extension operators (similarity,
  multimodal) so Python exchange is columnar, never per-row pickling.
- Timestamps stay Spark-native (µs). The reference hand-downcasts ns→µs
  (reference dags/tasks/utils.py:73-75); Spark is µs-native so this is free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "music-analytics-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Whole-stage-codegen class cache. The default (100 entries)
        # evicts constantly under a multi-query analytics workload —
        # with ~35 headline queries in flight, wide generated classes
        # (32-column MinHash signatures, pivot matrices) recompile on
        # every run, ~0.5-1 s per affected query (measured at sf0.1).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # Align Spark's whole-stage-codegen fallback with the JVM JIT's
        # own refusal threshold: HotSpot never compiles methods over
        # 8000 bytecode bytes (-XX:DontCompileHugeMethods, on by
        # default), so a fused whole-stage method past that size runs
        # BYTECODE-INTERPRETED — strictly slower than the per-operator
        # codegen Spark falls back to when the compiled method exceeds
        # this limit. The default (65535) happily keeps un-JIT-able
        # methods: measured on the 64-dim cosine pair scorer at sf0.1,
        # the fused stage ran 1.9 s vs 0.5 s per-operator (4×); wide
        # expression chains (PQ/SQ8 encodes, md5 LSH banding) hit the
        # same cliff. JVM-architectural, not data- or host-dependent.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
