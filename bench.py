"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a noop-format write — full execution of
the plan on every partition, no driver-side collect bottleneck.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from music_streaming_data_pipeline_v2_spark.session import get_spark
from music_streaming_data_pipeline_v2_spark.plans.driver_queries import REGISTRY

HEADLINE = [
    # reference-surface analogs
    "daily_kpis",
    "top_users_per_type_day",
    "kv_table",
    "pricing_summary",
    "revenue_by_nation",
    "top_parts_per_brand",
    "order_priority_semi",
    "validate_events",
    "hourly_activity",
    "grouping_sets_marginals",
    "daily_gapfill",
    # extension operators (training-data pipeline surface)
    "dedup_exact_docs",
    "minhash_lsh_pairs_docs",
    "simhash_pairs_docs",
    "ann_cosine_topk",
    "multimodal_features",
    "user_sessions",
    "asof_user_setting",
    "dataset_split_counts",
    # round 2: reshaping/profile/text/SQL-surface breadth
    "pivot_event_type_matrix",
    "value_histogram",
    "inverted_index_tokens",
    "redacted_docs",
    "small_qty_orders_scalar_subq",
    # round 2: entity resolution + iterative graph clustering + kernel
    "fuzzy_part_pairs",
    "dedup_clusters",
    "ewma_per_user",
    # JVM-native funnel (lead window); the applyInPandas variant
    # `click_purchase_funnel` stays in queries() as the Python-kernel
    # extensibility demo, correctness-checked against the same oracle.
    "click_purchase_funnel_native",
    # round 3: LLM curation batch (chunking / packing / decontamination /
    # rebalancing / winnowed local fingerprints)
    "doc_chunks",
    "sequence_packing",
    "ngram_decontamination",
    "balanced_source_sample",
    "winnowed_fingerprints",
    "winnow_overlap_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup pass: JVM/codegen warmup, parquet footer + file-index
    # caching, broadcast thread pools — so the timed pass measures
    # steady-state query execution, not one-time session costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Per-query time = min of 2 timed passes: the min is robust to
    # transient co-tenant load on the bench host (a loaded single pass
    # masqueraded as a 1.5x regression in BENCH_r02), while still
    # measuring full plan execution each pass.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.monotonic() - t0, 3)
            timings[name] = min(elapsed, timings.get(name, elapsed))

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
