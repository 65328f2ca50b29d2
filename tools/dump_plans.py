"""Generate PLANS.md: physical-plan evidence for the headline queries.

For each bench query, extracts the properties the 100 TB design cares
about — join strategies, pushed filters, read schemas (column pruning),
exchange count, whole-stage-codegen coverage — so plan quality is
reviewable without re-running Spark.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.session import get_spark
from music_streaming_data_pipeline_v2_spark.plans.driver_queries import REGISTRY

from bench import HEADLINE

# Cross-round bench-number context the plan shapes alone don't show.
BENCH_NOTES = {
    "containment_pairs_docs": (
        "OUTPUT-bound at the bench sf, not candidate-bound: the "
        "synthetic corpus is near-dup-dense by design, so 5.15M of "
        "the 12.5M possible pairs genuinely pass the 0.6 gate at "
        "sf0.1 (threshold probe: 3.6M @0.8, 2.1M @0.9, 1.17M @0.95 — "
        "runtime tracks rows written over a ~4 s base). On a real "
        "corpus the prefix filter prunes candidates; here nothing is "
        "prunable because the answer itself is half of all pairs. "
        "Downstream consumers (clustering) contract identical sets "
        "first, which is why dedup_clusters stays cheap on the same "
        "corpus."
    ),
    "bpe_merge_steps": (
        "the dumped plan is the tail union of the k lazily-"
        "localCheckpointed 1-row argmax picks — at action time the "
        "chain runs as k sequential vocabulary-sized jobs (pair "
        "aggregate → TakeOrderedAndProject argmax → broadcast 1-row "
        "replace), each step's input checkpointed so plan growth is "
        "linear in k (the mmr_rerank idiom). The corpus is scanned "
        "exactly once, by the word-frequency step."
    ),
    "minhash_drop_stats_oracle": (
        "pays the md5-portable hash family by design (8 md5 "
        "evaluations per shingle row, hex-digit arithmetic — the "
        "semantics-proof variant, same front half as "
        "minhash_lsh_oracle): ~7 s at sf0.1 vs 2.1 s for the "
        "xxhash64 production pipeline whose counters "
        "(minhash_drop_stats) ride the pair-mining pass for free. "
        "The counter aggregate itself is one bucket-size relation "
        "pass, bounded by bands × distinct band hashes."
    ),
    "wordpiece_merge_steps": (
        "same unrolled-checkpoint shape as bpe_merge_steps; each step "
        "additionally joins the pair counts to the per-symbol counts "
        "(two vocabulary-bounded hash joins) for the likelihood "
        "argmax."
    ),
    "mmr_rerank_topk": (
        "the dumped plan is the driver-greedy result relation (r9): "
        "Spark computes the candidate top-k and the 6-dp integer "
        "sims (flat codegen cosine), a limit-probe shows they fit "
        "the collect threshold, and the k_select greedy loop runs "
        "in driver memory with decision-for-decision identical "
        "exact-integer semantics — 44 → 10 jobs per run at sf0.1. "
        "Oversized candidate sets take the distributed unrolled "
        "loop (anti-join + bounded pair join + per-query argmax "
        "window per step, eagerly checkpointed so plan growth stays "
        "linear in k_select), pinned equal by "
        "test_mmr_driver_loop_equals_distributed."
    ),
    "winnowed_fingerprints": (
        "r3→r4 0.31→0.74 s is a MEASUREMENT correction, not a code "
        "regression: r3's number read the sketch subtree winnow_overlap_pairs "
        "persist()s warm out of the CacheManager (plan-keyed cache sharing); "
        "r4's clearCache-per-pass (commit 113fc90) made every pass cold. "
        "Probe at sf0.1: warm 0.63 s vs cold 1.17 s in one session — the "
        "same ratio. A fully map-only rewrite (per-doc array HOFs, zero "
        "exchanges) was measured 2.4× SLOWER (interpreted lambda md5 "
        "dominates), so the one doc-keyed window shuffle stays."
    ),
    "minhash_lsh_pairs_docs": (
        "r3→r4 +31% is the same clearCache-per-pass measurement correction "
        "as winnowed_fingerprints (r3 passes shared persisted subtrees "
        "across the min-of-2); the hashed-shingle speedup (113fc90) is "
        "real but was measured against a warm r3 baseline."
    ),
    "kv_table": (
        "r5: persist is now cost-based ('auto'). At sf0.1 the no-persist "
        "plan wins (1.31 s vs 2.35 s persisted, cache-cold min-of-2): the "
        "FINAL adaptive plan shares the grain exchange via ReusedExchange, "
        "so the r3 '14 exchanges / AQE does not dedupe' audit was reading "
        "the pre-finalization plan. Past ~2 GiB of fact input the grain is "
        "persisted (one fact scan instead of two)."
    ),
    "ivfpq_topk_adc": (
        "same fixed driver-side expression analysis as pq_topk_adc, times "
        "three strings (encode + coarse scorer + ADC table) — flat 10x "
        "scaling (SCALE.md); candidate work is nprobe/n_cells of the codes."
    ),
    "pq_topk_adc": (
        "~2 s of the entry is FIXED driver-side work: analyzing the "
        "1024-term encode/table SQL expressions (per query invocation, "
        "independent of data size — execution is 0.4 s at sf0.1). The "
        "eager localCheckpoints of codes and the distance table keep those "
        "expressions out of every downstream stage, which already cut the "
        "entry from 6.7 s; at cluster scale codes are ingest-time state "
        "and the per-query cost is the 0.4 s join/rank path. One encode "
        "stage still exceeds the 64 KB generated-method limit and falls "
        "back to per-operator codegen (janino notices in the bench log "
        "are this, for the three pq_* entries only) — harmless at the "
        "measured 0.4 s execution; shrinking it further would mean "
        "union-per-subspace restructuring for no measurable win."
    ),
}


def summarize(plan: str) -> dict:
    # AQE's toString() appends an "== Initial Plan ==" section that
    # duplicates every node of the pre-adaptive plan — counting it
    # overstated exchanges by ~2× through round 4 (kv_table's "14
    # exchanges" were really 8 final ones, 2 of them ReusedExchange).
    # Summarize the FINAL plan only.
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "joins": sorted(set(re.findall(r"(\w*Join\w*) ", plan))),
        "pushed": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "schemas": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        # count DISTINCT exchange lines: toString() reprints a cached
        # (InMemoryRelation) subtree at every scan site, so a persisted
        # plan's internal exchanges would otherwise be counted once per
        # reference; distinct real exchanges always differ textually
        # (partitioning spec + expression ids).
        "exchanges": len(
            {
                ln.strip()
                for ln in plan.splitlines()
                if re.search(r"\bExchange ", ln) and "ReusedExchange" not in ln
            }
        ),
        # runtime-shared shuffles/broadcasts: map work ran once
        "reused": len(
            [ln for ln in plan.splitlines() if "ReusedExchange" in ln]
        ),
        # codegen'd operators carry a `*(stageId)` prefix in the plan
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "bad": sorted(
            set(re.findall(r"(CartesianProduct|BroadcastNestedLoopJoin)", plan))
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# PLANS — physical-plan evidence (auto-generated by tools/dump_plans.py)\n",
        f"Headline queries at `{sf_dir}`; properties extracted from "
        "the FINAL adaptive plan (`executedPlan` after collect, with "
        "the Initial Plan section stripped — r5 fix: counting it "
        "overstated exchanges ~2×).\n",
    ]
    for name in HEADLINE:
        df = REGISTRY[name].fn(spark, sf_dir)
        # execute THIS df's own query execution (a noop write would
        # execute a copy, leaving df's adaptive plan unfinalized)
        df.collect()
        s = summarize(df._jdf.queryExecution().executedPlan().toString())
        lines.append(f"## {name}\n")
        lines.append(f"- joins: {', '.join(s['joins']) or '(none)'}")
        reused = f" (+{s['reused']} reused)" if s["reused"] else ""
        lines.append(
            f"- exchanges: {s['exchanges']}{reused}; codegen stages: {s['codegen']}"
        )
        intended_nlj = {
            "benford_digit_audit": "the CONSTANT 9-row digit spine "
            "broadcast-cross-joined onto the groups-sized totals "
            "relation — ≤ 9 × groups rows regardless of input",
            "benford_source_gate": "inherits benford_digit_audit's "
            "9-row digit spine cross join (the gate is a 9→1 fold "
            "per group on top of the audit relation)",
            "ann_cosine_topk": "exact brute-force ANN is a cross join "
            "of the broadcast 5-row query set × corpus",
            "bm25_search": "the broadcast 1-row corpus-statistics "
            "relation (N, Σdl) cross-joined onto scored postings — "
            "constant-size regardless of corpus",
            "unigram_lm_quality": "the broadcast 1-row LM statistics "
            "relation (total, V) cross-joined onto scored tokens — "
            "constant-size regardless of corpus",
            "daily_gapfill": "the date spine (≤ days) × type list "
            "(≤ types) cartesian is generated metadata, both sides "
            "broadcast-tiny regardless of fact size",
            "balanced_source_sample": "the |strata|-row count relation "
            "× broadcast 1-row global-min cross join; both sides are "
            "aggregates, constant-size regardless of corpus size",
        "dsir_gumbel_topk": "the two broadcast 1-row corpus-total "
            "relations (raw/target feature counts) cross-joined onto "
            "the 256-row bucket log-ratio table — constant-size "
            "regardless of corpus",
        "vocab_coverage_curve": "the rank ≤ vocab_size non-equi join "
            "of the |sizes|-row spine × the top-max(N) cut, plus the "
            "broadcast 1-row total — both sides bounded by the "
            "caller's constant size list, never the corpus",
        "doc_length_quantiles": "the cum ≥ target non-equi join of "
            "the |quantiles|-row spine × the broadcast distinct-value "
            "histogram cumsum — both sides bounded (quantile list × "
            "distinct lengths), never the corpus",
        "length_quantiles_from_cells": "the |groups|-row totals × "
            "broadcast |quantiles|-row spine cross join — the "
            "identical grouped_quantiles_from_counts back half as "
            "length_quantiles_by_lang (this query IS that readout "
            "served from summed cells)",
        "length_quantiles_by_lang": "the |groups|-row totals × "
            "broadcast |quantiles|-row spine cross join (both bounded "
            "metadata); the rank-threshold join itself is the "
            "BroadcastHashJoin on the group key with the cum ≥ target "
            "residual",
        "heavy_hitter_tokens": "the broadcast 1-row corpus-total "
            "relation cross-joined onto the verified candidate counts "
            "— the single-scan threshold (r5 verdict #3: the total "
            "folds into the Misra-Gries summary pass instead of a "
            "second corpus action); constant-size regardless of "
            "corpus",
        "kn_bigram_quality": "the broadcast 1-row LM stats relation "
            "(bigram-type count, count-of-counts n1/n2, vocabulary) "
            "cross-joined onto the scoring join — constant-size "
            "regardless of corpus",
        "bpe_merge_steps": "each merge step broadcast-cross-joins its "
            "1-row argmax pair into the vocabulary replace — "
            "constant-size regardless of corpus or vocabulary",
        "bpe_token_lengths": "same 1-row per-step argmax cross joins "
            "as bpe_merge_steps inside the training chain; the encode "
            "itself is a word equi-join",
        "bpe_fertility_by_lang": "same 1-row per-step argmax cross "
            "joins as bpe_merge_steps inside the training chain; the "
            "encode is a word equi-join + a lang-keyed aggregate",
        "curated_bpe_merges": "the recipe's bounded-metadata cross "
            "joins (UniMax 1-row totals) plus the BPE chain's 1-row "
            "per-step argmax — both adjudicated on their parent "
            "queries (curation_recipe_e2e, bpe_merge_steps)",
        "curation_funnel_by_lang": "the clustering router's 1-row "
            "cost-probe cross join (dedup_clusters adjudication); "
            "funnel aggregates are plain grouped counts",
        "chi2_keyness_by_lang": "the broadcast 1-row global "
            "token-total relation cross-joined onto the vocab-sized "
            "contingency relation — constant-size regardless of "
            "corpus",
        "sq8_topk_sym": "the broadcast 5-row reconstructed query set "
            "× corpus cross join — the ann_cosine_topk/pq exact-twin "
            "shape, query-side bounded",
        "sq8_recall": "both ranking sides cross-join the broadcast "
            "5-row query set × corpus (approx + exact ground truth), "
            "then 1-row count relations combine — all bounded by the "
            "query list",
        "source_overlap_minhash": "the |groups|-row size relation × "
            "its broadcast twin (group-pair spine) — bounded metadata "
            "(sources², ~190 pairs), never shingles or documents",
        "ks_drift_by_source": "the distinct-value spine × broadcast "
            "|groups|-row totals × broadcast 1-row grand total — all "
            "aggregates, bounded by groups × distinct values, never "
            "input rows",
        "source_token_overlap_hll": "the distinct-group list × its "
            "broadcast twin (pair spine over the register relation) — "
            "bounded metadata (sources², ~190 pairs); registers and "
            "union sketches are ≤ pairs × 256 rows",
        "embedding_outlier_gate": "the |cells|-row broadcast centroid "
            "relation and the ≤m-row linear-counting-free percentile "
            "joins — all bounded by the codebook, never vectors",
        "tfidf_cosine_pairs_docs": "the broadcast 1-row n_docs "
            "relation cross-joined onto the vocabulary (idf inputs "
            "and the permille df cap) — constant-size regardless of "
            "corpus",
        "key_skew_audit_users": "the broadcast 1-row (total, n_keys) "
            "stats relation cross-joined onto the top-k cut — "
            "constant-size regardless of input",
        "eb_shrunk_bad_rates": "the broadcast 1-row global-totals "
            "relation cross-joined onto the |sources|-row rate "
            "relation — constant-size regardless of corpus",
        }
        if s["bad"]:
            if name in intended_nlj:
                lines.append(f"- nested-loop by design: {intended_nlj[name]}")
            else:
                lines.append(f"- ⚠ nested-loop nodes: {', '.join(s['bad'])}")
        for p in s["pushed"][:4]:
            if p:
                lines.append(f"- PushedFilters: `{p[:120]}`")
        for sc in s["schemas"][:4]:
            cols = [c.split(":")[0] for c in sc.split(",") if c]
            lines.append(f"- ReadSchema: {len(cols)} cols ({', '.join(cols[:8])}{'…' if len(cols) > 8 else ''})")
        if name in BENCH_NOTES:
            lines.append(f"- bench note: {BENCH_NOTES[name]}")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
