"""End-to-end LLM training-data curation demo on the testdata corpus.

The operators a 100 TB curation pipeline runs, composed in their
canonical order — every stage is an engine operator with its own
oracle-checked query, and the stage boundaries are plain DataFrames:

1. quality gate      — Gopher/C4-style score filter + unigram-LM
                       scoring (operators/text.py); PII and template
                       audits alongside; Gopher §A1.1 rule-flag audit
                       and the inter-shard n-gram overlap matrix
                       (operators/quality.py)
2. exact dedup       — md5-fingerprint groupBy (operators/dedup.py)
3. near-dup dedup    — exact-Jaccard clusters, cost-based routing
                       (operators/clustering.py:dedup_clusters_auto),
                       keeping the QUALITY-argmax representative per
                       cluster (cluster_representatives), not min-id
3b. semantic dedup   — SemDeDup over the embedding column, centroid-
                       blocked (operators/similarity.py:semantic_dedup)
4. decontamination   — n-gram overlap vs the eval split through the
                       broadcast Bloom prefilter
                       (operators/text.py:ngram_contamination_bloom)
4b. span removal     — the remove-the-window policy: eval-matching
                       windows excised from flagged train docs, each
                       doc trimmed to its longest clean segment
                       (operators/text.py:remove_contaminated_spans)
5. domain rebalance  — hash-threshold downsample to the smallest
                       source, then quality-weighted deterministic
                       thinning (operators/sampling.py)
5b. domain match/mix — DSIR importance vs a target slice (Gumbel
                       top-k exemplars) + alpha-temperature language
                       flattening (operators/sampling.py)
5c. data recipe      — per-source token-budget repeat plan
                       (operators/sampling.py:epoch_mix_plan)
8. boilerplate audit — heavy-hitter tokens (Misra-Gries + exact
                       verify, operators/frequency.py), reported not
                       dropped
6. chunk + pack      — context windows then fixed-budget bins
                       (operators/packing.py)
7. split             — contamination-safe train/val/test coined on
                       the near-dup COMPONENT id, so surviving near
                       duplicates can never straddle splits
                       (operators/sampling.py:dataset_split over the
                       component carried from stage 3)
9. retrieval probe   — BM25 top-k over the finished corpus, fused
                       with a dense cosine ranking by reciprocal-rank
                       fusion (operators/retrieval.py:rrf_fuse)
10. drift audit      — per-source PSI of the char-length distribution
                       vs the finished corpus (operators/drift.py)

Run:  python examples/curation_pipeline_demo.py  [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.clustering import (
    cluster_representatives,
    dedup_clusters_auto,
)
from music_streaming_data_pipeline_v2_spark.operators.dedup import exact_dedup
from music_streaming_data_pipeline_v2_spark.operators.frequency import (
    frequent_items,
)
from music_streaming_data_pipeline_v2_spark.operators.packing import (
    ENGINE_SAFE_WS,
    chunk_documents,
    pack_sequences,
)
from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    balanced_sample,
    dataset_split,
    dsir_gumbel_topk,
    dsir_importance,
    hash_bucket,
    temperature_sample,
)
from music_streaming_data_pipeline_v2_spark.operators.drift import psi_drift
from music_streaming_data_pipeline_v2_spark.operators.retrieval import rrf_fuse
from music_streaming_data_pipeline_v2_spark.operators.similarity import (
    cosine_topk,
    kmeans_lite,
    semantic_dedup,
)
from music_streaming_data_pipeline_v2_spark.operators.text import (
    bm25_topk,
    ngram_contamination_bloom,
    pii_scan,
    remove_contaminated_spans,
    quality_score,
    template_ngrams,
    unigram_logprob_score,
)
from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    epoch_mix_plan,
    unimax_plan,
    weighted_sample,
)
from music_streaming_data_pipeline_v2_spark.operators.quality import (
    gopher_quality_rules,
    source_ngram_overlap,
)
from music_streaming_data_pipeline_v2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_demo"
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import time as _time
    _t0 = _time.monotonic()
    _last = [_t0]

    def _mark(stage: str) -> None:
        # stage wall-clock to stderr as the run progresses (stdout
        # keeps the end-of-run report): makes demo slowdowns
        # attributable without a profiler
        now = _time.monotonic()
        print(
            f"[stage {stage}: {now - _last[0]:.0f}s, "
            f"total {now - _t0:.0f}s]",
            file=sys.stderr,
        )
        _last[0] = now

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 0. per-domain cap (RefinedWeb order: the quota comes FIRST so a
    # link-farm source cannot dominate every later stage's statistics)
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        group_cap_sample,
    )

    docs = group_cap_sample(docs, "source", "doc_id", cap=20)
    n0_cap = docs.count()
    _mark("0-cap")

    # 1. quality gate — rule features AND the unigram-LM score (CCNet
    # direction: a reference-corpus LM ranks crawl text); the demo
    # keeps rule-passing docs, records the LM score distribution
    scored = quality_score(docs)
    good = scored.filter(F.col("quality_score") >= 0.3).drop("quality_score")
    n1 = good.count()
    _mark("1-quality")
    lm_scores = unigram_logprob_score(good, good.filter(hash_bucket("doc_id") < 128))
    lm_lo = lm_scores.agg(F.min("avg_logprob")).first()[0]

    # 1b. PII audit (report; masking is pii_redact on the same patterns)
    n_pii = pii_scan(good).filter("has_pii").count()
    _mark("1b-pii")

    # 1b'. phrase blocklist audit (C4 §2.2 multi-token entries; the
    # single-term gate runs inside quality_score's rule family)
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        phrase_blocklist_gate,
    )

    n_phrase = (
        phrase_blocklist_gate(good, ["slow fast", "table table"])
        .filter(~F.col("keep"))
        .count()
    )

    # 1c. template audit: per-source boilerplate 4-grams
    n_templates = template_ngrams(good, n=4, min_doc_frac=0.2).count()

    # 1d. Gopher rule audit (report which rules bite — the score gate
    # above already filtered; the flags say WHY documents would drop)
    # and the inter-shard 4-gram overlap (which crawls duplicate each
    # other — a shard-level signal the doc-level dedup below won't see)
    rules = gopher_quality_rules(good)
    n_rule_fail = rules.filter(~F.col("keep")).count()
    worst_overlap = (
        source_ngram_overlap(good, n=4)
        .orderBy(F.desc("jaccard"))
        .select("source_a", "source_b", "jaccard")
        .first()
    )

    # 2. exact dedup (keep min doc_id per identical normalized text)
    keep_exact = exact_dedup(good).select("doc_id")
    good = good.join(keep_exact, "doc_id")
    n2 = good.count()
    _mark("2-exact")

    # 3. near-dup clusters → keep the best-quality doc per cluster
    # (argmax by distinct-token ratio, not min-id), carrying the
    # component id forward so the split in stage 7 is leakage-safe
    clusters = dedup_clusters_auto(good, "lang", "text", "doc_id", 0.8)
    reps = cluster_representatives(good, clusters)
    good = good.join(
        reps.select(F.col("rep_doc_id").alias("doc_id"), "component"),
        "doc_id",
    )
    n3 = good.count()
    _mark("3-neardup")

    # 3b. semantic dedup over the embedding column (1:1 doc_id↔vec_id
    # in the testdata); kmeans-lite codebook, drop non-representatives
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.join(good.select(F.col("doc_id").alias("vec_id")), "vec_id")
    codebook = kmeans_lite(emb, n_centroids=8)
    sem_kept = (
        semantic_dedup(emb, codebook, threshold=0.4, dims=len(codebook[0]))
        .filter("kept")
        .select(F.col("id").alias("doc_id"))
    )
    good = good.join(sem_kept, "doc_id")
    n3b = good.count()
    _mark("3b-semantic")

    # 4. decontamination vs the held-out split (content-hash test
    # slice), train postings cut map-side by the test grams' Bloom
    # filter before the gram shuffle — identical results, see bloom.py
    b = hash_bucket("doc_id")
    train_side, eval_side = good.filter(b < 230), good.filter(b >= 230)
    leaked = ngram_contamination_bloom(train_side, eval_side, n=5).select(
        F.col("doc_id").alias("leak_id")
    )
    # drop *eval* docs that leak from train (conservative direction)
    good = good.join(leaked, good.doc_id == leaked.leak_id, "left_anti")
    n4 = good.count()
    _mark("4-decontam")

    # 4b. span-level removal on the TRAIN side (the remove-the-window
    # policy the r7 span report serves): excise eval-matching windows
    # (+2-token margin) instead of dropping whole train docs. Policy
    # here: each flagged doc keeps its LONGEST clean segment — id- and
    # schema-stable for the downstream stages; a segments-as-documents
    # pipeline would instead re-key on segment_id (operator emits it).
    segs = remove_contaminated_spans(
        good.filter(b < 230), good.filter(b >= 230),
        n=5, margin=2, min_segment_tokens=3,
    )
    from pyspark.sql import Window as _Wnd

    best = (
        segs.withColumn(
            "_rk",
            F.row_number().over(
                _Wnd.partitionBy("doc_id").orderBy(
                    F.desc("n_tokens"), "seg_index"
                )
            ),
        )
        .filter("_rk = 1")
        .select("doc_id", F.col("text").alias("_clean_text"))
    )
    good = (
        good.join(best, "doc_id", "left")
        .withColumn("text", F.coalesce("_clean_text", "text"))
        .drop("_clean_text")
        # the span-removal subtree (gram screen + excision windows) is
        # the most expensive link in the chain — cut the lineage here
        # or stages 5-5b re-execute it once per action (measured:
        # 5-rebalance 210 s un-checkpointed vs seconds with)
        .localCheckpoint()
    )
    n4b = good.count()
    _mark("4b-span-removal")

    # 5. rebalance sources toward uniform, then quality-proportional
    # thinning: keep long documents with probability ∝ token count
    # (deterministic content-hash coin — reproducible across engines)
    good = balanced_sample(good, "source", "doc_id")
    toks = F.filter(F.split(F.trim(F.col("text")), ENGINE_SAFE_WS),
                    lambda x: x != F.lit(""))
    good = weighted_sample(
        good.withColumn("_w", F.least(F.lit(1.0), F.size(toks) / F.lit(40.0))),
        "_w", "doc_id",
    ).drop("_w")
    n5 = good.count()
    _mark("5-rebalance")

    # 5b. target-domain match + language mix: DSIR importance of each
    # survivor against the src0-2 "target domain" (top exemplars via
    # the derandomized Gumbel-top-k — reported, a config would drive a
    # resample), then temperature-flatten the language mixture
    target_side = docs.filter(F.col("source").isin("src0", "src1", "src2"))
    exemplars = dsir_gumbel_topk(dsir_importance(good, target_side), k=3).collect()
    good = temperature_sample(
        good, "lang", "doc_id", alpha=0.3, budget_frac=0.9
    ).drop("rate")
    n5b = good.count()
    _mark("5b-mix")
    # localCheckpoint: `good` is now the end of the mutation chain
    # (cap → gate → exact → near-dup → semantic → decontam →
    # rebalance → DSIR/temperature mix) and stages 5c-10 fire ~10
    # separate actions against it — un-checkpointed, EVERY action
    # re-executes the whole chain including the clustering and DSIR
    # subtrees (measured: the demo's 6-10 block alone exceeded 10 min
    # at sf0.001 before this line; the mmr_rerank lineage lesson at
    # pipeline granularity)
    good = good.localCheckpoint()

    # 5c. data recipe: ONE total budget water-filled into per-source
    # allocations (UniMax, 4-epoch repeat cap), then each allocation
    # turned into per-document repeat counts (whole epochs +
    # hash-ordered remainder prefix) — what the training loader
    # consumes alongside the packed bins
    alloc = unimax_plan(good, total_budget=8_000, max_epochs=4)
    budgets = alloc.select(
        "source", F.col("alloc_tokens").alias("budget_tokens")
    )
    mix = epoch_mix_plan(good, budgets=budgets)
    mix_tokens = (
        mix.agg(F.sum(F.col("n_tokens") * F.col("repeat_count"))).first()[0]
    )

    # 6. chunk to context windows, pack into token budgets
    chunks = chunk_documents(good, chunk_tokens=24, overlap=8)
    packed = pack_sequences(good, budget=256)
    n_chunks, n_bins = chunks.count(), packed.select("stratum", "bin_id").distinct().count()

    # 7. contamination-safe split coined on the near-dup component —
    # near-duplicates (including any that survived through different
    # lang blocks) can never straddle train/test
    final = dataset_split(good, "component")
    out = os.path.join(workdir, "corpus")
    final.write.mode("overwrite").partitionBy("split").parquet(out)
    splits = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 8. boilerplate audit: corpus-wide heavy-hitter tokens (report,
    # don't drop — the curation decision belongs to a human/config)
    tok = good.select(
        F.explode(F.split(F.trim("text"), ENGINE_SAFE_WS)).alias("value")
    ).filter(F.col("value") != "")
    hh = frequent_items(tok, "value", min_fraction=0.01).count()

    # 9. retrieval sanity probe over the finished corpus: BM25 top-3
    # for a fixed query — the serving-side check that curated shards
    # still answer keyword lookups — fused with a dense cosine ranking
    # over the surviving embeddings (hybrid search, RRF)
    probes = spark.createDataFrame([(0, "spark window join")],
                                   "query_id int, text string")
    bm = bm25_topk(good, probes, k=10)
    surv = emb.join(good.select(F.col("doc_id").alias("vec_id")), "vec_id")
    qv = surv.orderBy("vec_id").limit(1).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    dn = cosine_topk(surv, qv, k=10).select(
        "query_id", "rank", F.col("neighbor_id").alias("doc_id")
    )
    hybrid = rrf_fuse(
        {"bm25": bm.select("query_id", "rank", "doc_id"), "dense": dn}, k=3
    )
    top = bm.filter("rank <= 3").collect()
    htop = hybrid.collect()

    # 10. drift audit: PSI of each source's char-length distribution
    # vs the finished corpus — the per-shard health line a sharded
    # ingest watches before trusting a new crawl
    psi_hi = (
        psi_drift(
            good,
            "source",
            F.expr("LEAST(CAST(n_chars DIV 64 AS INT), 8)"),
        )
        .agg(F.max("psi"))
        .first()[0]
    )

    _mark("6-10-audits-splits-probes")
    print(f"corpus:        {n0} docs")
    print(f"domain cap:    {n0_cap} kept (<=20/source)")
    print(f"quality gate:  {n1} kept; {n_phrase} phrase-blocklist hits")
    print(f"exact dedup:   {n2} kept")
    print(f"near-dup:      {n3} kept")
    print(f"semantic:      {n3b} kept")
    print(f"decontam:      {n4} kept")
    print(f"span removal:  {n4b} kept (flagged train docs trimmed "
          "to longest clean segment)")
    print(f"rebalanced:    {n5} kept")
    print(f"domain+mix:    {n5b} kept; DSIR exemplars "
          f"{[(r.doc_id, round(r.score, 3)) for r in exemplars]}")
    # worst_overlap is None when NO source pair shares a 4-gram (single
    # source, or an aggressive gate) — the matrix is sparse by design
    overlap_note = (
        f"worst shard overlap {worst_overlap['source_a']}~"
        f"{worst_overlap['source_b']} J={worst_overlap['jaccard']:.3f}"
        if worst_overlap is not None
        else "no cross-source 4-gram overlap"
    )
    print(f"gopher audit:  {n_rule_fail} docs fail a rule flag; "
          f"{overlap_note}")
    print(f"epoch mix:     {mix_tokens} total mixed tokens "
          f"(8k total, UniMax-allocated, 4-epoch cap)")
    print(f"chunks:        {n_chunks} windows; packed bins: {n_bins}")
    print(f"splits:        {splits} -> {out}")
    print(f"boilerplate:   {hh} heavy-hitter tokens (freq >= 1%); "
          f"{n_templates} template 4-grams (>=20% of a source)")
    # lm_lo / psi_hi are None when their input split is empty (gated
    # corpus, or the hash-bucket<128 LM reference split) — same guard
    # class as worst_overlap above
    lm_note = f"{lm_lo:.3f}" if lm_lo is not None else "n/a"
    print(f"pii audit:     {n_pii} docs flagged; min LM score {lm_note}")
    print(f"bm25 probe:    {[(r.doc_id, round(r.score, 3)) for r in top]}")
    print(f"hybrid probe:  {[(r.doc_id, r.n_sources) for r in htop]}")
    psi_note = f"{psi_hi:.3f}" if psi_hi is not None else "n/a"
    print(f"drift audit:   max source PSI {psi_note}")

    # 11. the same recipe as ONE composed plan — the oracle-checked
    # production entrypoint (operators/curation.py:curation_recipe,
    # driver query `curation_recipe_e2e`): dedup → quality-argmax
    # representatives → integer-exact gate → component-coined split →
    # UniMax water-fill → epoch mix, stage contracts pinned end to end
    from music_streaming_data_pipeline_v2_spark.operators.curation import (
        curation_recipe,
    )

    # localCheckpoint: the recipe subtree (near-dup clustering →
    # representatives → gate → split → unimax → epochs) feeds SIX
    # downstream consumers (summary, three tokenizer trainers, the
    # dataloader order, the shard audit) — un-checkpointed, every one
    # re-executes the clustering chain (the mmr_rerank lineage lesson;
    # measured: demo wall-clock blew past 15 min from the repeats)
    recipe = curation_recipe(
        docs, total_budget=6_001, max_epochs=3
    ).localCheckpoint()
    _mark("11-recipe-checkpoint")
    summary = (
        recipe.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("n_tokens") * F.col("repeat_count")).alias(
                "mixed_tokens"
            ),
        )
        .orderBy("split")
        .collect()
    )
    print(
        "e2e recipe:    "
        + "; ".join(
            f"{r.split}: {r.docs} docs, {r.mixed_tokens} mixed tokens"
            for r in summary
        )
    )

    # 12. tokenizer induction on the CURATED train split (the data a
    # tokenizer should see — post-dedup, post-gate, train-only so the
    # held-out splits never leak into the subword inventory): first
    # BPE merges vs the WordPiece likelihood variant
    # (operators/bpe.py; driver queries bpe_merge_steps /
    # wordpiece_merge_steps).
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
        wordpiece_merges,
    )

    train_docs = docs.join(
        recipe.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    ).localCheckpoint()  # five consumers below (three trainers + two audits)
    _mark("11b-recipe-summary")
    bm = bpe_merges(train_docs, k=4)[0].orderBy("step").collect()
    wm = wordpiece_merges(train_docs, k=4)[0].orderBy("step").collect()
    fmt = lambda rows: " ".join(f"{r.lhs}+{r.rhs}" for r in rows)  # noqa: E731
    print(f"tokenizer:     BPE merges [{fmt(bm)}] | WordPiece [{fmt(wm)}]")

    # 12b. the third trainer: unigram-LM (hard-EM Viterbi over the
    # same train split; operators/unigram.py)
    from music_streaming_data_pipeline_v2_spark.operators.unigram import (
        unigram_train,
    )

    _mark("12-bpe-wordpiece")
    uv = unigram_train(train_docs, vocab_size=30, iterations=2)
    top_pieces = (
        uv.filter(F.length("piece") > 1)
        .orderBy(F.desc("count"), "piece")
        .limit(4)
        .collect()
    )
    print(
        "unigram:       top multi-char pieces "
        + " ".join(f"{r.piece}:{r['count']}" for r in top_pieces)
    )

    # 13. ship it: dense epoch-1 shuffle positions for the train split
    # (two-phase zipWithIndex — no single-reducer window) and
    # rendezvous shard assignment to 8 training workers, with the
    # 8→9 resize-disruption audit
    from music_streaming_data_pipeline_v2_spark.operators.ids import (
        dense_row_numbers,
    )
    from music_streaming_data_pipeline_v2_spark.operators.sharding import (
        rendezvous_assign,
        shard_movement,
    )

    _mark("12b-unigram")
    coined = train_docs.withColumn(
        "_coin",
        F.md5(F.concat(F.lit("e|1|"), F.col("doc_id").cast("string"))),
    )
    ordered = dense_row_numbers(coined, ["_coin", "doc_id"], num_partitions=8)
    sharded = rendezvous_assign(ordered, "doc_id", 8)
    shard_sizes = sorted(
        (r["shard"], r["count"])
        for r in sharded.groupBy("shard").count().collect()
    )
    mv = shard_movement(train_docs, "doc_id", 8, 9).first()
    _mark("13-dataloader")
    print(
        f"dataloader:    epoch-1 order over {ordered.count()} train docs; "
        f"shard sizes {[c for _, c in shard_sizes]}; "
        f"8->9 resize moves {mv['moved_permille']} permille"
    )


if __name__ == "__main__":
    main()
