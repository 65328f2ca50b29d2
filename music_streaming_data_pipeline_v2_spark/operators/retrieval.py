"""Retrieval composition operators: reciprocal-rank fusion of
heterogeneous rankings, ranking-quality metrics (MRR / nDCG@k), and
greedy MMR diversification.

These close the loop on the engine's retrieval surface (BM25 in
operators/text.py, dense ANN in operators/similarity.py): production
RAG/search pipelines fuse a lexical and a dense ranking (hybrid
search), evaluate rankings against labeled ground truth, and
diversify the final list. All three are expressed as DataFrame
compositions — no Python kernels — so every step stays JVM-side and
whole-stage-codegen'd.

Engine portability follows the repo's scaled-BIGINT playbook
(operators/text.py:bm25_topk): any cross-row float sum is rounded to
9 dp and summed as integers, so aggregation order (partition-
dependent in Spark) can never flip a rank or an oracle hash.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def rrf_fuse(
    rankings: Mapping[str, DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    Rank Fusion outperforms Condorcet and individual Rank Learning
    Methods", SIGIR 2009): fuse per-query rankings from heterogeneous
    retrievers by ``score(d) = Σ_sources 1/(c + rank_source(d))``,
    the standard hybrid-search combiner (lexical BM25 ⊕ dense ANN) —
    it needs no score calibration because only ranks enter.

    ``rankings`` maps a source name to a DataFrame carrying
    ``(query_col, rank_col, id_col)``; documents absent from a source
    simply contribute nothing. Returns
    ``(query_id, rank, doc_id, rrf_score, n_sources)``, top-``k`` per
    query, ties broken by doc id ascending.

    Engine portability: each source's ``1/(c+rank)`` is a pure
    function of an integer rank, rounded to 9 dp and summed as a
    scaled BIGINT — the fused score is identical under any partition
    order and any engine. Scale: the union is ∝ Σ|rankings| (each
    already top-depth-bounded per query), one (query, doc)-keyed
    aggregation and one per-query ranking window — never touches the
    corpora themselves.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = []
    for src_idx, (_src, df) in enumerate(rankings.items()):
        parts.append(
            df.select(
                F.col(query_col).alias("query_id"),
                F.col(id_col).alias("_doc"),
                F.col(rank_col).cast("long").alias("_rank"),
                F.lit(src_idx).alias("_src"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # one row per (query, doc, SOURCE) before fusing: a source ranking
    # that lists a doc twice would otherwise both inflate n_sources and
    # double-add that source's 1/(c+rank) mass — best (min) rank wins,
    # matching how RRF treats a retriever that returns duplicates
    dedup = u.groupBy("query_id", "_doc", "_src").agg(
        F.min("_rank").alias("_rank")
    )
    contrib = F.round(
        F.lit(1e9) / (F.lit(int(c)) + F.col("_rank").cast("double"))
    ).cast("long")
    fused = dedup.groupBy("query_id", "_doc").agg(
        F.sum(contrib).alias("_score_i"),
        F.count("*").cast("int").alias("n_sources"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_score_i"), F.asc("_doc"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("_doc").alias(id_col),
            (F.col("_score_i").cast("double") / F.lit(1e9)).alias("rrf_score"),
            "n_sources",
        )
    )


def retrieval_metrics(
    ranking: DataFrame,
    labels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-query ranking quality against labeled ground truth: MRR and
    binary-relevance nDCG@k (Järvelin & Kekäläinen, "Cumulated
    Gain-Based Evaluation of IR Techniques", TOIS 2002). A neighbor is
    relevant iff it carries the query's label; the query itself never
    counts as its own relevant (n_relevant = |label class| − 1).

    Returns ``(query_id, n_relevant, first_rel_rank, mrr, ndcg)``:
    ``first_rel_rank`` NULL and ``mrr`` 0.0 when no retrieved neighbor
    is relevant; ``ndcg`` NULL when the query's class is a singleton
    (no achievable ideal).

    Engine portability: DCG's per-hit ``1/log2(rank+1)`` terms and the
    ideal DCG's ``Σ_{i≤min(R,k)} 1/log2(i+1)`` both accumulate as
    scaled BIGINTs (DCG via an integer aggregate, IDCG via a
    sequentially-evaluated higher-order fold over a generated index
    sequence — tiny, ≤k elements, off the hot path), so nDCG is a
    single division of two exact integers. Scale: two broadcast-sized
    label joins and one query-keyed aggregate over an already
    top-k-bounded ranking — cost ∝ |queries|·k, independent of corpus
    size.
    """
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lab")
    )
    class_sizes = lab.groupBy("_lab").agg(F.count("*").alias("_class_n"))
    qlab = (
        ranking.select(query_col).distinct()
        .join(F.broadcast(lab), F.col(query_col) == F.col("_id"))
        .join(F.broadcast(class_sizes), "_lab")
        .select(
            F.col(query_col).alias("query_id"),
            F.col("_lab").alias("_qlab"),
            (F.col("_class_n") - F.lit(1)).alias("n_relevant"),
        )
    )
    hits = (
        ranking.select(
            F.col(query_col).alias("query_id"),
            F.col(rank_col).alias("_rank"),
            F.col(neighbor_col).alias("_nbr"),
        )
        .filter(F.col("_rank") <= k)
        # LEFT join: a retrieved neighbor absent from the label table
        # is simply not relevant — an inner join here silently DROPPED
        # the whole query when none of its neighbors were labeled,
        # instead of reporting mrr 0.0 as documented
        .join(F.broadcast(lab), F.col("_nbr") == F.col("_id"), "left")
        .join(F.broadcast(qlab), "query_id")
        .withColumn(
            "_rel",
            F.when(F.col("_lab") == F.col("_qlab"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    dcg_term = (
        "CASE WHEN _rel = 1 THEN CAST(ROUND(1e9 / LOG2(CAST(_rank AS DOUBLE)"
        " + 1.0)) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    agg = hits.groupBy("query_id", "n_relevant").agg(
        F.min(F.when(F.col("_rel") == 1, F.col("_rank"))).alias(
            "first_rel_rank"
        ),
        F.sum(F.expr(dcg_term)).alias("_dcg_i"),
    )
    idcg = (
        f"CASE WHEN n_relevant <= 0 THEN CAST(0 AS BIGINT) ELSE "
        f"aggregate(sequence(1, LEAST(CAST(n_relevant AS INT), {int(k)})), "
        "CAST(0 AS BIGINT), (acc, i) -> acc + CAST(ROUND(1e9 / "
        "LOG2(CAST(i AS DOUBLE) + 1.0)) AS BIGINT)) END"
    )
    return (
        agg.withColumn("_idcg_i", F.expr(idcg))
        .select(
            "query_id",
            "n_relevant",
            F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mrr"),
            F.when(
                F.col("_idcg_i") > 0,
                F.col("_dcg_i").cast("double") / F.col("_idcg_i").cast("double"),
            ).alias("ndcg"),
        )
    )


def _cos6i(a: Column, b: Column) -> Column:
    """Cosine as an exact scaled integer (×1e6) for cross-engine
    argmax stability: MMR compares DERIVED scores across engines, so
    similarities are pinned to 6-dp integers once, and every score
    after that is exact BIGINT arithmetic — no rounding of computed
    values anywhere. (Rounding the λ-combination instead was measurably
    unsafe: 0.7·x − 0.3·y of two 6-dp values lands EXACTLY on the
    7th-decimal rounding boundary for ~10% of inputs, where engines'
    half-up/half-even conventions diverge — caught by the
    test_mmr_matches_python_greedy fuzz.)"""
    return F.round(cosine(a, b) * F.lit(1e6)).cast("long")


def _cos6i_flat(av: str, bv: str, an: str, bn: str, dims: int) -> Column:
    """``_cos6i`` with the cosine spelled as the flat ``dims``-term
    codegen sum over precomputed map-side norms — identical summation
    order and values (similarity.dot_sql documents the IEEE argument);
    the interpreted higher-order fold was the whole runtime of the
    candidate cross join."""
    from .similarity import dot_sql

    cos = F.when(
        (F.col(an) * F.col(bn)) != F.lit(0.0),
        F.expr(dot_sql(av, bv, dims)) / (F.col(an) * F.col(bn)),
    )
    return F.round(cos * F.lit(1e6)).cast("long")


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k_candidates: int = 15,
    k_select: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_partitions: int | None = None,
    exclude_self: bool = True,
    dims: int | None = None,
    driver_threshold: int | None = 50_000,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR 1998): greedily select ``k_select`` results from
    each query's top-``k_candidates`` exact-cosine candidates,
    maximizing ``λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s)`` at
    each step — relevance traded against redundancy with what's
    already picked.

    Greedy selection is inherently sequential in ``k_select`` but NOT
    in the data: each step is one anti-join (drop already-selected),
    one join against the bounded pairwise-similarity relation, a max
    aggregate, and a per-query argmax window. ``k_select`` is a small
    fixed constant, so the loop unrolls into a static DataFrame plan —
    no Python kernel, no driver data movement; all per-query work is
    bounded by k_candidates². ``exclude_self=True`` (default) drops
    the corpus row whose id EQUALS the query id — correct when queries
    are drawn from the corpus (the registry's self-retrieval shape),
    but it assumes a SHARED id namespace: if query ids and corpus ids
    are unrelated, an accidental collision would silently drop a
    legitimate candidate — pass ``exclude_self=False`` there.

    Returns ``(query_id, step, vec_id, relevance, mmr_score)`` —
    ``step`` is the 1-based selection order; ``mmr_score`` of step 1
    is its plain relevance (nothing selected yet to be redundant
    with). Determinism: similarities are pinned to 6-dp INTEGERS once
    and every derived score is exact ``λ_i·simq_i − (1e6−λ_i)·max_i``
    BIGINT arithmetic (ties break by id ascending), so the greedy
    path is engine- and partitioning-independent with NO rounding of
    computed scores — see ``_cos6i``.

    Precondition: corpus ids are unique per ``id_col`` (or duplicate
    ids carry identical vectors). Duplicated ids with DIFFERENT
    vectors are nondeterministic on both paths — the driver dict
    keeps an arbitrary collected row's similarity, the distributed
    argmax window keeps an arbitrary winner among equal-id rows — so
    dedupe upstream if that shape can occur.

    ``driver_threshold``: cost-based driver greedy (the
    bpe_merges_from_freqs / connected_components precedent). The
    candidate relation is bounded by |queries|·k_candidates and every
    score DOWNSTREAM of the Spark-computed 6-dp integer sims is exact
    integer arithmetic — identical in Python ints — so when a
    limit-probe shows the candidates fit the threshold (scaled down
    when ``k_candidates`` exceeds the default 15, so the pair collect
    stays within the same driver budget), the
    k_select-step sequential job chain (anti-join + redundancy join +
    argmax window + eager checkpoint per step, ~3 jobs each) collapses
    to two bounded collects and an in-memory loop with
    decision-for-decision identical semantics (same argmax ordering,
    same IEEE divisions for the two output doubles). Oversized
    candidate sets take the distributed loop unchanged; pass ``None``
    to force it.
    """
    from .similarity import norm_sql

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    corp = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
    )
    if dims is not None:
        # flat codegen scoring (see _cos6i_flat): norms once per
        # vector map-side, the |corpus|·|queries| cross join and the
        # k_candidates² pair build both reuse them
        q = q.withColumn("_qn", F.expr(norm_sql("_qv", dims)))
        corp = corp.withColumn("_cn", F.expr(norm_sql("_cv", dims)))
    scored = corp.join(F.broadcast(q), how="cross")
    if exclude_self:
        scored = scored.filter(F.col("_cid") != F.col("query_id"))
    simq = (
        _cos6i_flat("_qv", "_cv", "_qn", "_cn", dims)
        if dims is not None
        else _cos6i(F.col("_qv"), F.col("_cv"))
    )
    scored = scored.withColumn("_simq", simq).filter(
        F.col("_simq").isNotNull()
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("_simq"), F.asc("_cid"))
    # The candidate relation is ≤ |queries|·k_candidates rows — the
    # per-step frames are all bounded by it, and every downstream job
    # inherits its partitioning. Fewer, fuller partitions cut the
    # per-step task-launch overhead (measured 3.2 → 2.3 s at the
    # 3-query registry shape); size up for large query batches.
    n_part = num_partitions or max(
        1, corpus.sparkSession.sparkContext.defaultParallelism // 8
    )
    nrm_cols = ["_cn"] if dims is not None else []
    cand = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= k_candidates)
        .select("query_id", "_cid", "_simq", "_cv", *nrm_cols)
        .repartition(n_part, "query_id")
        .localCheckpoint(eager=True)  # feeds pair build + every step
    )
    left_cols = [F.col("_cid").alias("_a"), F.col("_cv").alias("_av")] + (
        [F.col("_cn").alias("_an")] if dims is not None else []
    )
    right_cols = [F.col("_cid").alias("_b"), F.col("_cv").alias("_bv")] + (
        [F.col("_cn").alias("_bn")] if dims is not None else []
    )
    pair_sim = (
        _cos6i_flat("_av", "_bv", "_an", "_bn", dims)
        if dims is not None
        else _cos6i(F.col("_av"), F.col("_bv"))
    )
    pair = (
        cand.select("query_id", *left_cols)
        .join(cand.select("query_id", *right_cols), "query_id")
        .filter(F.col("_a") != F.col("_b"))
        .withColumn("_sim", pair_sim)
        .select("query_id", "_a", "_b", "_sim")
    )
    lam_i = int(round(float(lam) * 1e6))
    if driver_threshold is not None:
        # The driver path ships BOTH the candidate relation and the
        # pair relation (≤ |cand|·(k_candidates−1) rows). Bound the
        # candidate probe so the pair collect stays within the budget
        # the threshold was sized for (threshold candidates at the
        # default k_candidates=15): a caller passing a huge
        # k_candidates falls back to the distributed loop instead of
        # blowing the driver with |cand|·k_candidates pair rows.
        cand_cap = min(
            int(driver_threshold),
            (int(driver_threshold) * 15) // max(1, int(k_candidates) - 1),
        )
        crows = (
            cand.select("query_id", "_cid", "_simq")
            .limit(cand_cap + 1)
            .collect()
        )
        if len(crows) <= cand_cap:
            from pyspark.sql import types as T

            by_q: dict = {}
            for r in crows:
                # dict keyed by candidate id — a duplicated corpus id
                # collapses exactly like the distributed groupBy/
                # anti-join pair do (same vector ⟹ same simq)
                by_q.setdefault(r[0], {})[r[1]] = r[2]
            sim_ab: dict = {}
            for r in pair.collect():  # bounded: ≤ |cand|·k_candidates
                sim_ab[(r[0], r[1], r[2])] = r[3]
            out_rows = []
            for qid, cands in by_q.items():
                # step 1: pure relevance argmax, ties by id ascending
                # (min over (-score, id) so any ORDERABLE id type
                # works — negating the id would TypeError on strings,
                # where the distributed path's F.asc("_cid") is fine)
                cid = min(cands, key=lambda c: (-cands[c], c))
                rel = float(cands[cid]) / 1e6
                out_rows.append((qid, 1, cid, rel, rel))
                sel = [cid]
                for s in range(2, int(k_select) + 1):
                    rem = [c for c in cands if c not in sel]
                    if not rem:
                        break
                    best, best_key = None, None
                    for c in rem:
                        maxsim = max(sim_ab[(qid, c, b)] for b in sel)
                        score = lam_i * cands[c] - (1_000_000 - lam_i) * maxsim
                        key = (-score, c)  # min ⇒ ties by id ascending
                        if best_key is None or key < best_key:
                            best, best_key = (c, score), key
                    c, score = best
                    out_rows.append(
                        (qid, s, c, float(cands[c]) / 1e6, float(score) / 1e12)
                    )
                    sel.append(c)
            out_schema = T.StructType(
                [
                    T.StructField(
                        "query_id", cand.schema["query_id"].dataType
                    ),
                    T.StructField("step", T.IntegerType(), False),
                    T.StructField(id_col, cand.schema["_cid"].dataType),
                    T.StructField("relevance", T.DoubleType()),
                    T.StructField("mmr_score", T.DoubleType()),
                ]
            )
            return corpus.sparkSession.createDataFrame(out_rows, out_schema)
    pair = pair.localCheckpoint(eager=True)  # reused by every greedy step
    cand = cand.drop("_cv", *nrm_cols)
    # step 1: pure relevance argmax
    w1 = Window.partitionBy("query_id").orderBy(F.desc("_simq"), F.asc("_cid"))
    selected = (
        cand.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.lit(1).alias("step"),
            F.col("_cid").alias("_sel"),
            (F.col("_simq").cast("double") / F.lit(1e6)).alias("relevance"),
            (F.col("_simq").cast("double") / F.lit(1e6)).alias("mmr_score"),
        )
        # each step's pick is checkpointed eagerly: step s references
        # the selected-so-far set TWICE (anti-join + redundancy join)
        # and unions onto it, so un-checkpointed lineage doubles per
        # step — exponential plan growth in k_select. Checkpointing
        # the (one-row-per-query) picks makes plan size linear
        # (measured 4.2 → 3.2 s; the candidate repartition above takes
        # it to 2.3 s — the rest is the k_select sequential job chain).
        .localCheckpoint(eager=True)
    )
    for s in range(2, int(k_select) + 1):
        prev = selected.select("query_id", F.col("_sel"))
        remaining = cand.join(
            prev.withColumnRenamed("_sel", "_cid"),
            ["query_id", "_cid"],
            "left_anti",
        )
        red = (
            remaining.join(
                pair.join(
                    prev.withColumnRenamed("_sel", "_b"), ["query_id", "_b"]
                ).select("query_id", F.col("_a").alias("_cid"), "_sim"),
                ["query_id", "_cid"],
            )
            .groupBy("query_id", "_cid", "_simq")
            .agg(F.max("_sim").alias("_maxsim"))
            # exact BIGINT score: |simq_i| ≤ 1e6, so the products are
            # ≤ 1e12 — no overflow, no float, no rounding boundary
            .withColumn(
                "_score",
                F.lit(lam_i) * F.col("_simq")
                - F.lit(1_000_000 - lam_i) * F.col("_maxsim"),
            )
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.desc("_score"), F.asc("_cid")
        )
        pick = (
            red.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                F.lit(s).alias("step"),
                F.col("_cid").alias("_sel"),
                (F.col("_simq").cast("double") / F.lit(1e6)).alias(
                    "relevance"
                ),
                (F.col("_score").cast("double") / F.lit(1e12)).alias(
                    "mmr_score"
                ),
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        "query_id",
        "step",
        F.col("_sel").alias(id_col),
        "relevance",
        "mmr_score",
    )
