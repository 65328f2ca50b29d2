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
    # round 4: bloom-prefiltered decontamination + semantic dedup +
    # sketch-verified heavy hitters
    "bloom_decontamination",
    "semantic_dedup_decisions",
    "heavy_hitter_tokens",
    # round 5: retrieval + curation scoring (BM25, unigram-LM quality,
    # PII audit, quality-weighted sampling)
    "bm25_search",
    "unigram_lm_quality",
    "pii_scan_counts",
    "weighted_doc_sample",
    "boilerplate_ngrams",
    "pq_codes",
    "pq_topk_adc",
    "ivfpq_topk_adc",
    "duplicated_spans",
    "dsir_gumbel_topk",
    "bm25_hard_negatives",
    "line_dedup_docs",
    # round 5 late: cluster-level curation (leakage-safe splits share
    # the clustering subtree with cluster_representatives — timed
    # separately, cache-cold per pass like everything else)
    "leakage_safe_split",
    "cluster_representatives",
    "bigram_lm_quality",
    # round 5 late: retrieval composition (hybrid RRF over BM25+dense,
    # MRR/nDCG eval, MMR diversification), whole-document NFD bin
    # packing (pandas recurrence kernel), PSI drift audit
    "rrf_hybrid_topk",
    "retrieval_mrr_ndcg",
    "mmr_rerank_topk",
    "nfd_bin_packing",
    "source_drift_psi",
    "char_entropy_scores",
    "embedding_decontamination",
    "textrank_keywords",
    "nb_domain_routing",
    "concurrent_activity_pairs",
    "ccnet_quality_buckets",
    # round 5 late: Gopher page-quality gate (map-only rule flags) and
    # repetition signals (doc-keyed gram count — the boilerplate
    # detector ahead of dedup)
    "gopher_quality_rules",
    "gopher_repetition_signals",
    "source_ngram_overlap",
    "epoch_mix_plan",
    "vocab_oov_rate",
    "cm_token_counts",
    "vocab_coverage_curve",
    "unimax_allocation",
    "recipe_epochs_unimax",
    "doc_length_quantiles",
    "length_quantiles_by_lang",
    # round 6: the curation pipeline composed end-to-end as one plan
    # (dedup -> representatives -> gate -> split -> unimax -> epochs),
    # and the oracle-replayable HLL distinct sketch
    "curation_recipe_e2e",
    "hll_distinct_users",
    "kn_bigram_quality",
    "blocklist_gate_docs",
    "dedup_clusters_star",
    "session_window_native",
    "variant_json_agg",
    # round 6 late: asymmetric containment dedup and cluster-granular
    # k-fold assignment (shares the clustering subtree with
    # leakage_safe_split; timed cache-cold like everything else)
    "containment_pairs_docs",
    "kfold_leakage_safe",
    # round 6 late: BPE tokenizer induction (vocabulary-compressed
    # merge mining; unrolled static k-step plan) + the corpus-encode
    # compression audit built on the trained vocabulary
    "bpe_merge_steps",
    "bpe_token_lengths",
    "wordpiece_merge_steps",
    # round 6 late: FineWeb-style within-source percentile calibration
    # (aggregate-before-window, no document-row sort)
    "quality_percentile_by_source",
    "bpe_fertility_by_lang",
    "minhash_drop_stats_oracle",
    "curated_bpe_merges",
    "curation_funnel_by_lang",
    "chi2_keyness_by_lang",
    "sq8_codes",
    "sq8_topk_sym",
    "sq8_recall",
    "source_overlap_minhash",
    "ks_drift_by_source",
    "ngram_novelty_scores",
    "embedding_outlier_gate",
    "source_token_overlap_hll",
    "tfidf_cosine_pairs_docs",
    "session_attribution_first_touch",
    "lang_confusion_matrix",
    "key_skew_audit_users",
    "eb_shrunk_bad_rates",
    "pmi_collocations",
    "rendezvous_shards",
    "rendezvous_stability",
    "per_domain_cap_sample",
    "phrase_blocklist_docs",
    "python_datasource_agg",
    "epoch_shuffle_positions",
    "unigram_vocab_counts",
    "unigram_token_lengths_docs",
    # round 7
    "unigram_encode_oracle",
    "contamination_spans_docs",
    "quantile_normalized_lengths",
    "compression_ratio_docs",
    "clipped_precision_pairs",
    "half_life_popularity",
    # round 8
    "decontaminated_docs",
    "half_life_from_cells",
    "mad_outlier_events",
    "benford_digit_audit",
    "mad_clipped_means_events",
    # round 9
    "mad_from_cells",
    "benford_source_gate",
    "column_profile_events",
    "skyline_parts",
    "length_quantiles_from_cells",
]


def _stage_waves(
    spark, df, staged: str, waves: int, tag: str, wave_key=None
) -> list[list[str]]:
    """Write df as CSV part files split into ``waves`` deterministic
    waves under ``staged`` (untimed setup; NOT inside the watched
    directory), returning per-wave file lists to move into the watched
    directory between drains.

    ``wave_key`` is a Column in [0, waves) assigning each row's wave;
    default is a row-hash split (order-free corpora, e.g. documents).
    Time-ordered sources should pass a chronological key — real file
    arrivals deliver each day's data together, and a hash split would
    make every wave touch every date, defeating (and mis-measuring)
    the touched-dates-only recompute the incremental pipeline prunes
    by."""
    import glob
    import shutil

    from pyspark.sql import functions as F
    out: list[list[str]] = []
    # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) overflows (throws
    # under ANSI mode; silently drops the row from every wave otherwise)
    key = (
        wave_key
        if wave_key is not None
        else F.pmod(F.hash(*df.columns), F.lit(waves))
    )
    for w in range(waves):
        wdir = os.path.join(staged, f"w{w}")
        df.filter(key == w).repartition(4).write.mode("overwrite").option(
            "header", "true"
        ).csv(wdir)
        files = []
        for i, part in enumerate(sorted(glob.glob(os.path.join(wdir, "*.csv")))):
            dst = os.path.join(staged, f"{tag}_w{w}_{i}.csv")
            shutil.move(part, dst)
            files.append(dst)
        out.append(files)
    return out


def bench_streaming(spark, sf_dir: str, work_root: str) -> dict[str, float]:
    """Multi-batch replays of the two incremental (Structured
    Streaming, availableNow) pipelines — each wave of files is moved
    into the watched directory and drained as its own run, mirroring
    the reference's per-arrival operation. Timed: the drains (discovery
    + validate + recompute/index maintenance + state commit); untimed:
    synthesizing the CSV waves from the sf tables."""
    import shutil

    from pyspark.sql import functions as F

    from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
        _music_tables,
        load_table,
    )
    from music_streaming_data_pipeline_v2_spark.streaming import (
        run_incremental_dedup,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.pipeline import (
        run_incremental_pipeline,
    )

    timings: dict[str, float] = {}
    for attempt in range(2):  # min-of-2, fresh state each pass
        work = os.path.join(work_root, f"pass{attempt}")

        # --- incremental KPI pipeline over music-shaped event waves
        streams, songs, users = _music_tables(spark, sf_dir)
        pipe_in = os.path.join(work, "pipe", "in")
        os.makedirs(pipe_in, exist_ok=True)
        # chronological thirds: each wave carries a contiguous date
        # range, like real daily file arrivals — so each drain's
        # recompute touches only its own dates (the pruning the
        # pipeline is designed around), not the full history
        d0, d1 = streams.select(
            F.min(F.to_date("listen_time")), F.max(F.to_date("listen_time"))
        ).first()
        span = max((d1 - d0).days + 1, 1)
        chrono = F.least(
            F.lit(2),
            F.floor(F.datediff(F.to_date("listen_time"), F.lit(d0)) * 3 / span),
        ).cast("int")
        waves = _stage_waves(
            spark,
            streams.select(
                "user_id",
                "track_id",
                F.date_format("listen_time", "yyyy-MM-dd HH:mm:ss").alias(
                    "listen_time"
                ),
            ),
            os.path.join(work, "pipe", "staged"),
            waves=3,
            tag="stream",
            wave_key=chrono,
        )
        songs, users = songs.localCheckpoint(), users.localCheckpoint()
        t0 = time.monotonic()
        for files in waves:
            for f in files:
                shutil.move(f, pipe_in)
            run_incremental_pipeline(
                spark,
                pipe_in,
                songs,
                users,
                os.path.join(work, "pipe", "out"),
                os.path.join(work, "pipe", "ckpt"),
            )
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_pipeline"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental near-dup index over document waves
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        dd_in = os.path.join(work, "dedup", "in")
        os.makedirs(dd_in, exist_ok=True)
        waves = _stage_waves(
            spark, docs, os.path.join(work, "dedup", "staged"), waves=3, tag="docs"
        )
        t0 = time.monotonic()
        for files in waves:
            for f in files:
                shutil.move(f, dd_in)
            # the PLAIN index configuration: pair mining only, no
            # component-labeling snapshot (that cost belongs to the
            # curation entry below, whose serving path reads it) —
            # keeps this entry's timing the LSH index itself and
            # cross-round comparable with pre-comps captures
            run_incremental_dedup(
                spark,
                dd_in,
                os.path.join(work, "dedup", "work"),
                jaccard_threshold=0.5,
                num_hashes=32,
                bands=16,
                shingle_k=3,
                maintain_components=False,
            )
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_dedup"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- curation served from incremental near-dup state: its own
        # dedup-state replay (separate work dir so the timing of the
        # plain dedup replay above stays cross-round comparable), with
        # one full recipe read over the accumulated state per drain
        from music_streaming_data_pipeline_v2_spark.streaming.curation_ingest import (
            query_curation,
        )

        cu_in = os.path.join(work, "curation", "in")
        os.makedirs(cu_in, exist_ok=True)
        cwaves = _stage_waves(
            spark,
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "text"
            ),
            os.path.join(work, "curation", "staged"),
            waves=3,
            tag="cdocs",
        )
        cwork = os.path.join(work, "curation", "work")
        t0 = time.monotonic()
        for files in cwaves:
            for f in files:
                shutil.move(f, cu_in)
            run_incremental_dedup(
                spark,
                cu_in,
                cwork,
                jaccard_threshold=0.5,
                num_hashes=32,
                bands=16,
                shingle_k=3,
            )
            query_curation(spark, cwork, 60_000, 3).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_curation"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental BM25 index over document waves (JSONL), plus
        # one query over the accumulated state per drain — the serving
        # read is part of what the index exists for
        from music_streaming_data_pipeline_v2_spark.streaming.index_ingest import (
            query_index,
            run_incremental_index,
        )

        ix_in = os.path.join(work, "index", "in")
        os.makedirs(ix_in, exist_ok=True)
        staged = os.path.join(work, "index", "staged")
        jwaves = []
        key = F.pmod(F.hash("doc_id"), F.lit(3))
        for wnum in range(3):
            wdir = os.path.join(staged, f"w{wnum}")
            docs.select("doc_id", "text").filter(key == wnum).repartition(
                4
            ).write.mode("overwrite").json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(staged, f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            jwaves.append(files)
        probe = spark.createDataFrame(
            [(0, "spark window join"), (1, "hash table scan")],
            "query_id int, text string",
        ).localCheckpoint()
        wdirx = os.path.join(work, "index", "work")
        t0 = time.monotonic()
        for files in jwaves:
            for f in files:
                shutil.move(f, ix_in)
            run_incremental_index(spark, ix_in, wdirx)
            query_index(spark, wdirx, probe, k=10).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_index"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental DSIR state over the same JSONL waves, plus
        # one scoring read over the accumulated state per drain
        from music_streaming_data_pipeline_v2_spark.streaming.dsir_ingest import (
            query_dsir_scores,
            run_incremental_dsir,
        )

        ds_in = os.path.join(work, "dsir", "in")
        os.makedirs(ds_in, exist_ok=True)
        target = (
            docs.filter(F.col("source").isin("src0", "src1", "src2"))
            .select("doc_id", "text")
            .localCheckpoint()
        )
        dwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "dsir", "staged", f"w{wnum}")
            docs.filter(~F.col("source").isin("src0", "src1", "src2")).select(
                "doc_id", "text"
            ).filter(key == wnum).repartition(4).write.mode("overwrite").json(
                wdir
            )
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "dsir", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            dwaves.append(files)
        wdird = os.path.join(work, "dsir", "work")
        t0 = time.monotonic()
        for files in dwaves:
            for f in files:
                shutil.move(f, ds_in)
            run_incremental_dsir(spark, ds_in, wdird)
            query_dsir_scores(spark, wdird, target).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_dsir"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental line dedup over lineified document waves,
        # plus one read of the accumulated deduped output per drain
        from music_streaming_data_pipeline_v2_spark.operators.packing import (
            lineify_tokens,
        )
        from music_streaming_data_pipeline_v2_spark.streaming.line_ingest import (
            read_deduped_docs,
            run_incremental_line_dedup,
        )

        ld_in = os.path.join(work, "linededup", "in")
        os.makedirs(ld_in, exist_ok=True)
        lwaves = []
        lined = docs.select(
            "doc_id", lineify_tokens("text", 10).alias("text")
        )
        for wnum in range(3):
            wdir = os.path.join(work, "linededup", "staged", f"w{wnum}")
            lined.filter(key == wnum).repartition(4).write.mode(
                "overwrite"
            ).json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "linededup", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            lwaves.append(files)
        wdirl = os.path.join(work, "linededup", "work")
        t0 = time.monotonic()
        for files in lwaves:
            for f in files:
                shutil.move(f, ld_in)
            run_incremental_line_dedup(spark, ld_in, wdirl)
            read_deduped_docs(spark, wdirl).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_linededup"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental PSI drift state over (doc, source) waves,
        # plus one drift read over the accumulated state per drain
        from music_streaming_data_pipeline_v2_spark.streaming.psi_ingest import (
            query_psi,
            run_incremental_psi,
        )

        ps_in = os.path.join(work, "psi", "in")
        os.makedirs(ps_in, exist_ok=True)
        # fresh projection: `docs` above was pruned to (doc_id, lang,
        # text) — filters on `source` resolve through the child, but a
        # select cannot
        pdocs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        pwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "psi", "staged", f"w{wnum}")
            pdocs.filter(key == wnum).repartition(4).write.mode(
                "overwrite"
            ).json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "psi", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            pwaves.append(files)
        wdirp = os.path.join(work, "psi", "work")
        t0 = time.monotonic()
        for files in pwaves:
            for f in files:
                shutil.move(f, ps_in)
            run_incremental_psi(spark, ps_in, wdirp)
            query_psi(spark, wdirp).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_psi"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental per-source MinHash signatures (corpus
        # overlap matrix), reusing the PSI waves' (doc, source)
        # staging; one pair-matrix read over the merged state per
        # drain
        from music_streaming_data_pipeline_v2_spark.streaming.overlap_ingest import (
            query_overlap,
            run_incremental_overlap,
        )

        ov_in = os.path.join(work, "overlap", "in")
        os.makedirs(ov_in, exist_ok=True)
        owaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "overlap", "staged", f"w{wnum}")
            pdocs.filter(key == wnum).repartition(4).write.mode(
                "overwrite"
            ).json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "overlap", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            owaves.append(files)
        wdiro = os.path.join(work, "overlap", "work")
        t0 = time.monotonic()
        for files in owaves:
            for f in files:
                shutil.move(f, ov_in)
            run_incremental_overlap(spark, ov_in, wdiro)
            query_overlap(spark, wdiro).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_overlap"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental per-domain cap (k-MIN candidate cells),
        # reusing the same (doc, source) waves; one capped-corpus read
        # over the merged state per drain
        from music_streaming_data_pipeline_v2_spark.streaming.cap_ingest import (
            query_capped,
            run_incremental_cap,
        )

        cap_in = os.path.join(work, "cap", "in")
        os.makedirs(cap_in, exist_ok=True)
        cwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "cap", "staged", f"w{wnum}")
            pdocs.filter(key == wnum).repartition(4).write.mode(
                "overwrite"
            ).json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "cap", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            cwaves.append(files)
        wdirc = os.path.join(work, "cap", "work")
        t0 = time.monotonic()
        for files in cwaves:
            for f in files:
                shutil.move(f, cap_in)
            run_incremental_cap(spark, cap_in, wdirc, cap=15)
            query_capped(spark, wdirc, cap=15).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_cap"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental winnow (MOSS) overlap index over the same
        # doc waves, plus one cross-batch pair read per drain
        from music_streaming_data_pipeline_v2_spark.streaming.winnow_ingest import (
            query_overlap_pairs,
            run_incremental_winnow,
        )

        wn_in = os.path.join(work, "winnow", "in")
        os.makedirs(wn_in, exist_ok=True)
        wwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "winnow", "staged", f"w{wnum}")
            docs.select("doc_id", "text").filter(key == wnum).repartition(
                4
            ).write.mode("overwrite").json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "winnow", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            wwaves.append(files)
        wdirw = os.path.join(work, "winnow", "work")
        t0 = time.monotonic()
        for files in wwaves:
            for f in files:
                shutil.move(f, wn_in)
            run_incremental_winnow(spark, wn_in, wdirw)
            query_overlap_pairs(spark, wdirw).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_winnow"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- incremental decontamination firewall (VERDICT r7 #4: the
        # one ingest family without a timing series): pinned eval-gram
        # postings built once from the content-hash test slice, then
        # each train wave screened gram-keyed on arrival, plus one
        # read of the accumulated hit rows per drain
        from music_streaming_data_pipeline_v2_spark.operators.sampling import (
            hash_bucket,
        )
        from music_streaming_data_pipeline_v2_spark.streaming.decontam_ingest import (
            init_decontam_state,
            query_contamination,
            run_incremental_decontam,
        )

        dc_in = os.path.join(work, "decontam", "in")
        os.makedirs(dc_in, exist_ok=True)
        bkt = hash_bucket("doc_id")
        all_docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        dcwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "decontam", "staged", f"w{wnum}")
            all_docs.filter(bkt < 204).filter(key == wnum).repartition(
                4
            ).write.mode("overwrite").json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "decontam", f"docs_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            dcwaves.append(files)
        wdirdc = os.path.join(work, "decontam", "work")
        # untimed, like wave staging: the pinned eval postings are
        # one-time state setup, not per-drain work — the entry times
        # the drains + serving reads, the per-arrival cost profile
        init_decontam_state(
            spark, wdirdc, all_docs.filter(bkt >= 230), n=5
        )
        t0 = time.monotonic()
        for files in dcwaves:
            for f in files:
                shutil.move(f, dc_in)
            run_incremental_decontam(spark, dc_in, wdirdc)
            query_contamination(spark, wdirdc).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_decontam"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- per-group value-cell state (robust stats at ingest):
        # event values drained as (id, grp, value) waves, plus one
        # MAD readout over the accumulated cells per drain
        from music_streaming_data_pipeline_v2_spark.streaming.value_ingest import (
            query_mad_stats,
            run_incremental_values,
        )

        from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
            load_events,
        )

        va_in = os.path.join(work, "values", "in")
        os.makedirs(va_in, exist_ok=True)
        # load_events, not load_table: it sets the NANOS-timestamp
        # read conf the events parquet needs even with ts pruned away
        events = load_events(spark, sf_dir).select(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("grp"),
            "value",
        )
        vkey = F.pmod(F.hash("id"), F.lit(3))
        vwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "values", "staged", f"w{wnum}")
            events.filter(vkey == wnum).repartition(4).write.mode(
                "overwrite"
            ).json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(work, "values", f"rows_w{wnum}_{i}.jsonl")
                shutil.move(part, dst)
                files.append(dst)
            vwaves.append(files)
        wdirv = os.path.join(work, "values", "work")
        t0 = time.monotonic()
        for files in vwaves:
            for f in files:
                shutil.move(f, va_in)
            run_incremental_values(spark, va_in, wdirv)
            query_mad_stats(spark, wdirv).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_values"
        timings[name] = min(elapsed, timings.get(name, elapsed))

        # --- decontam firewall in emit_cleaned mode (VERDICT r8 #5):
        # the same train-slice waves drained through the pinned eval
        # postings, but each batch ALSO excises contaminated spans and
        # lands the cleaned segment corpus; one serving read per drain
        dcc_in = os.path.join(work, "decontam_clean", "in")
        os.makedirs(dcc_in, exist_ok=True)
        dccwaves = []
        for wnum in range(3):
            wdir = os.path.join(work, "decontam_clean", "staged", f"w{wnum}")
            all_docs.filter(bkt < 204).filter(key == wnum).repartition(
                4
            ).write.mode("overwrite").json(wdir)
            import glob as _glob

            files = []
            for i, part in enumerate(
                sorted(_glob.glob(os.path.join(wdir, "*.json")))
            ):
                dst = os.path.join(
                    work, "decontam_clean", f"docs_w{wnum}_{i}.jsonl"
                )
                shutil.move(part, dst)
                files.append(dst)
            dccwaves.append(files)
        wdirdcc = os.path.join(work, "decontam_clean", "work")
        from music_streaming_data_pipeline_v2_spark.streaming.decontam_ingest import (
            query_cleaned_corpus,
        )

        init_decontam_state(
            spark, wdirdcc, all_docs.filter(bkt >= 230), n=5
        )
        t0 = time.monotonic()
        for files in dccwaves:
            for f in files:
                shutil.move(f, dcc_in)
            run_incremental_decontam(
                spark, dcc_in, wdirdcc, emit_cleaned=True
            )
            query_cleaned_corpus(spark, wdirdcc).count()
        elapsed = round(time.monotonic() - t0, 3)
        name = "streaming_incremental_decontam_clean"
        timings[name] = min(elapsed, timings.get(name, elapsed))
    return timings


_LOADAVG_AT_START = [round(x, 2) for x in os.getloadavg()]


def _git_head() -> str | None:
    """Current commit sha (best effort — None outside a git checkout)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=10,
        )
        return out.stdout.strip() or None if out.returncode == 0 else None
    except Exception:
        return None


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
        # Queries that persist() a shared intermediate (kv_table's plays
        # grain) would otherwise reuse the warmup pass's cache entry —
        # CacheManager keys by canonicalized plan, so a later invocation
        # silently reads the earlier materialization. Each timed pass
        # starts cold so it pays that materialization exactly once, as a
        # real run of the query would.
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.monotonic() - t0, 3)
            timings[name] = min(elapsed, timings.get(name, elapsed))

    # Streaming path: multi-batch availableNow replays with real file
    # movement and checkpoint state (fresh temp dirs per pass).
    import shutil
    import tempfile

    work_root = tempfile.mkdtemp(prefix="bench_streaming_")
    try:
        timings.update(bench_streaming(spark, sf_dir, work_root))
    finally:
        shutil.rmtree(work_root, ignore_errors=True)

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # Load stamp from capture START (before the session spun up —
        # mid/end-of-run loadavg would just measure the bench's own 32
        # worker threads). Cross-round comparison is meaningless when
        # either capture started on a loaded host — r6's 1.15x
        # "regression" was pure host drift — so compare_bench.py
        # refuses comparisons when either side's 1-min figure > 2.
        "loadavg": _LOADAVG_AT_START,
        # Code-era stamp: compare_bench's element-wise-min mode folds
        # multiple captures of the SAME code into per-query minima
        # (co-tenant drift the loadavg gate can't see — SCALE.md r8);
        # it refuses to fold captures whose heads differ.
        "git_head": _git_head(),
    }
    # Durable sidecar FIRST: the driver records only a bounded tail of
    # stdout, and with 80+ queries the single JSON line outgrows that
    # window (BENCH_r05.json captured 67 of ~157 queries, parsed: null).
    # BENCH_TIMES.json lives in-repo and is committed at round end, so
    # per-query timings survive for cross-round regression tracking
    # even when the stdout line is clipped.
    times_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_TIMES.json"
    )
    with open(times_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # The contract line (final stdout line, compact separators). With
    # 143+ entries it is ~4.2 KB against the driver's 2000-char stdout
    # tail, so tail-side parses CANNOT see the whole line — the
    # durable channel is the BENCH_TIMES.json sidecar above (written
    # BEFORE the print, git_head-stamped, committed in-repo), which is
    # what recovered the round-9 numbers after the round-8 tail clip.
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
