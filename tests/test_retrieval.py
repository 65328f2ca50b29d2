"""Retrieval composition (RRF fusion, MRR/nDCG metrics, MMR), NFD bin
packing, and PSI drift — semantics tests with hand-computed expectations.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.drift import psi_drift
from music_streaming_data_pipeline_v2_spark.operators.packing import (
    pack_bins_nfd,
)
from music_streaming_data_pipeline_v2_spark.operators.retrieval import (
    mmr_rerank,
    retrieval_metrics,
    rrf_fuse,
)


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long"
    )


def test_rrf_fuse_hand_computed(spark):
    a = _ranking(spark, [(0, 1, 10), (0, 2, 11), (0, 3, 12)])
    b = _ranking(spark, [(0, 1, 11), (0, 2, 13)])
    out = rrf_fuse({"a": a, "b": b}, k=10, c=60).collect()
    got = {r.doc_id: r for r in out}
    # doc 11: rank 2 in a + rank 1 in b — present in both sources
    def c(rank):
        return round(1e9 / (60 + rank)) / 1e9

    assert got[11].n_sources == 2
    assert abs(got[11].rrf_score - (c(2) + c(1))) < 1e-12
    assert got[10].n_sources == 1 and abs(got[10].rrf_score - c(1)) < 1e-12
    # two-source doc 11 outranks every single-source doc
    assert got[11].rank == 1
    # ranks are dense 1..n per query
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


def test_rrf_fuse_tie_breaks_by_doc_id(spark):
    a = _ranking(spark, [(0, 1, 20), (0, 2, 21)])
    b = _ranking(spark, [(0, 1, 21), (0, 2, 20)])
    out = {r.doc_id: r.rank for r in rrf_fuse({"a": a, "b": b}).collect()}
    # identical fused scores → lower doc_id wins
    assert out[20] == 1 and out[21] == 2


def test_retrieval_metrics_hand_computed(spark):
    # query 1 (label 7): relevant neighbors at ranks 2 and 3 of 3
    # query 2 (label 8): nothing relevant retrieved
    # query 3 (label 9): singleton class → no achievable ideal
    ranking = spark.createDataFrame(
        [
            (1, 1, 104),
            (1, 2, 102),
            (1, 3, 103),
            (2, 1, 102),
            (3, 1, 104),
            (4, 1, 999),  # neighbor absent from the label table
        ],
        "query_id long, rank int, neighbor_id long",
    )
    labels = spark.createDataFrame(
        [
            (1, 7),
            (102, 7),
            (103, 7),
            (104, 6),
            (2, 8),
            (201, 8),
            (3, 9),
            (4, 8),
        ],
        "vec_id long, label int",
    )
    got = {
        r.query_id: r
        for r in retrieval_metrics(ranking, labels, k=3).collect()
    }
    assert got[1].n_relevant == 2
    assert got[1].first_rel_rank == 2 and abs(got[1].mrr - 0.5) < 1e-12
    # dcg = 1/log2(3) + 1/log2(4); idcg = 1/log2(2) + 1/log2(3)
    def t(i):
        return round(1e9 / math.log2(i + 1))

    want = (t(2) + t(3)) / (t(1) + t(2))
    assert abs(got[1].ndcg - want) < 1e-12
    assert got[2].first_rel_rank is None and got[2].mrr == 0.0
    assert got[3].n_relevant == 0 and got[3].ndcg is None
    # a query whose only neighbors are UNLABELED must still report
    # (mrr 0.0), not vanish from the result
    assert got[4].first_rel_rank is None and got[4].mrr == 0.0


def test_mmr_rerank_prefers_diversity(spark):
    # q: query vector; a,b near-duplicates highly similar to q;
    # c distinct direction, lower relevance. Plain top-2 = {a, b};
    # MMR step 2 must skip b (redundant with a) and take c.
    rows = [
        (0, [1.0, 0.0, 0.0]),  # the query itself (excluded)
        (1, [0.99, 0.14, 0.0]),  # a
        (2, [0.99, 0.141, 0.0]),  # b ~ duplicate of a
        (3, [0.7, 0.0, 0.71]),  # c diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mmr_rerank(emb, q, k_candidates=3, k_select=2, lam=0.5).collect()
    sel = {r.step: r for r in out}
    assert sel[1].vec_id == 1  # highest relevance, tie broken by id
    assert sel[2].vec_id == 3  # diversity beats the near-duplicate
    assert sel[2].mmr_score < sel[2].relevance


def test_mmr_selects_distinct_and_caps_steps(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mmr_rerank(emb, q, k_candidates=10, k_select=4).collect()
    for qid in (0, 1):
        picks = [r for r in out if r.query_id == qid]
        assert len(picks) == 4
        assert len({r.vec_id for r in picks}) == 4
        assert qid not in {r.vec_id for r in picks}  # self excluded
        assert sorted(r.step for r in picks) == [1, 2, 3, 4]


def test_pack_bins_nfd_hand_example(spark):
    # one stratum, budget 10, lengths sorted desc: 7 5 4 3 2
    #   7 → bin0(7); 5 overflows → bin1(5); 4 fits bin1(9);
    #   3 overflows → bin2(3); 2 fits bin2(5)
    docs = spark.createDataFrame(
        [
            (1, "s", "a a a a a a a"),
            (2, "s", "b b b b b"),
            (3, "s", "c c c c"),
            (4, "s", "d d d"),
            (5, "s", "e e"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r.doc_id: (r.bin_id, r.bin_fill)
        for r in pack_bins_nfd(docs, budget=10).collect()
    }
    assert got == {1: (0, 7), 2: (1, 5), 3: (1, 9), 4: (2, 3), 5: (2, 5)}


def test_pack_bins_nfd_invariants(spark):
    import random

    rng = random.Random(11)
    docs = spark.createDataFrame(
        [
            (i, f"s{i % 3}", " ".join("w" for _ in range(rng.randint(1, 40))))
            for i in range(200)
        ],
        "doc_id long, source string, text string",
    )
    out = pack_bins_nfd(docs, budget=25).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r.stratum, r.bin_id), []).append(r.n_tokens)
    for (_, _), sizes in by_bin.items():
        # a bin exceeds the budget only as a singleton over-long doc
        assert sum(sizes) <= 25 or (
            len(sizes) == 1 and sizes[0] > 25
        )
    for s in ("s0", "s1", "s2"):
        bins = sorted({r.bin_id for r in out if r.stratum == s})
        assert bins == list(range(len(bins)))  # dense from 0


def test_pack_bins_nfd_oversized_doc_gets_own_bin(spark):
    docs = spark.createDataFrame(
        [(1, "s", " ".join("w" for _ in range(30))), (2, "s", "x y")],
        "doc_id long, source string, text string",
    )
    got = {r.doc_id: r for r in pack_bins_nfd(docs, budget=10).collect()}
    assert got[1].bin_id == 0 and got[1].bin_fill == 30
    assert got[2].bin_id == 1  # never shares the overflowed bin


def test_psi_identical_groups_near_zero_shifted_group_flags(spark):
    rows = []
    i = 0
    # six large stable groups with the same bin mix dominate the
    # global reference; one small group shifts its mass to bin 2
    groups = [(f"g{k}", [0] * 50 + [1] * 50) for k in range(6)]
    groups.append(("shifted", [2] * 24 + [0] * 6))
    for g, mix in groups:
        for b in mix:
            rows.append((i, g, b))
            i += 1
    df = spark.createDataFrame(rows, "id long, grp string, bin int")
    got = {r.grp: r.psi for r in psi_drift(df, "grp", "bin").collect()}
    assert got["g0"] == got["g1"]  # symmetric inputs, exact equality
    assert got["g0"] < 0.25 < got["shifted"]
    assert got["shifted"] > 10 * got["g0"]


def test_psi_all_groups_same_distribution_is_tiny(spark):
    rows = [(i, f"g{i % 4}", i % 5) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string, bin int")
    for r in psi_drift(df, "grp", "bin").collect():
        assert abs(r.psi) < 1e-3
        assert r.n_rows == 100


def test_pagerank_scaled_matches_python_reference(spark):
    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        pagerank_scaled,
    )

    # star graph with a weighted triangle hanging off one spoke
    edge_list = [
        ("hub", "a", 1), ("a", "hub", 1),
        ("hub", "b", 1), ("b", "hub", 1),
        ("hub", "c", 1), ("c", "hub", 1),
        ("b", "c", 3), ("c", "b", 3),
    ]
    e = spark.createDataFrame(edge_list, "src string, dst string, w long")
    got = {
        r.node: r.rank_i
        for r in pagerank_scaled(e, iterations=3, weight_col="w").collect()
    }

    SCALE = 10**12
    nodes = sorted({s for s, _, _ in edge_list} | {d for _, d, _ in edge_list})
    outw = {}
    for s, _, w in edge_list:
        outw[s] = outw.get(s, 0) + w
    n = len(nodes)
    p = {v: SCALE // n for v in nodes}
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for s, d, w in edge_list:
            inc[d] += (p[s] * w) // outw[s]
        p = {
            v: (15 * (SCALE // n)) // 100 + (85 * inc[v]) // 100
            for v in nodes
        }
    assert got == p
    # the singly-linked spoke ranks below the hub; the mutually
    # reinforcing weight-3 pair (b, c) legitimately out-ranks both
    assert got["a"] < got["hub"]
    assert got["b"] == got["c"]  # symmetric nodes, exact equality


def test_textrank_hub_token_ranks_first(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        textrank_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark joins data"),
            (2, "spark windows data"),
            (3, "spark streams data"),
            (4, "unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(docs, k=10).collect()
    ranks = {r.keyword: r.rank_i for r in out}
    # 'spark' and 'data' are the co-occurrence hubs of their
    # component: each middle word splits its rank equally to both, so
    # they tie exactly and both out-rank every middle
    assert ranks["spark"] == ranks["data"]
    for mid in ("joins", "windows", "streams"):
        assert ranks[mid] < ranks["spark"]
    assert [r.pos for r in out] == list(range(1, len(out) + 1))


def test_nb_classify_separable_classes_and_prior_fallback(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        nb_classify,
    )

    train = spark.createDataFrame(
        [
            (1, "news", "election vote parliament policy"),
            (2, "news", "minister vote election debate"),
            (3, "news", "policy parliament minister"),
            (4, "sport", "goal match striker league"),
            (5, "sport", "league goal keeper match"),
        ],
        "doc_id long, source string, text string",
    )
    test = spark.createDataFrame(
        [
            (10, "vote for the policy election"),
            (11, "the striker scored a goal"),
            (12, ""),  # zero tokens -> prior argmax ('news', 3 > 2 docs)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in nb_classify(train, test).collect()}
    assert got[10].predicted == "news"
    assert got[11].predicted == "sport"
    assert got[12].predicted == "news" and got[12].n_tokens == 0


def test_pack_bins_nfd_string_ids(spark):
    docs = spark.createDataFrame(
        [("doc_a", "s", "w w w"), ("doc_b", "s", "w w")],
        "doc_id string, source string, text string",
    )
    got = {
        r.doc_id: r.bin_id for r in pack_bins_nfd(docs, budget=10).collect()
    }
    assert got == {"doc_a": 0, "doc_b": 0}


def test_cluster_representatives_accepts_cc_output_and_no_nchars(spark):
    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        cluster_representatives,
        connected_components,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "z z z z")],
        "doc_id long, text string",  # no n_chars column
    )
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    cc = connected_components(edges)  # columns (id, component)
    reps = {
        r.component: r.rep_doc_id
        for r in cluster_representatives(docs, cc).collect()
    }
    assert reps == {1: 1}  # equal quality/length -> id tiebreak


def test_connected_components_null_edges_do_not_hang(spark):
    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1)}


def test_rrf_fuse_duplicate_rows_within_source_count_once(spark):
    """A source that lists a doc twice (e.g. a buggy retriever) must
    contribute ONE vote (best rank) — not inflate n_sources or
    double-add reciprocal mass."""
    a = _ranking(spark, [(0, 1, 10), (0, 3, 10), (0, 2, 11)])
    b = _ranking(spark, [(0, 1, 11)])
    got = {r.doc_id: r for r in rrf_fuse({"a": a, "b": b}, c=60).collect()}

    def c(rank):
        return round(1e9 / (60 + rank)) / 1e9

    assert got[10].n_sources == 1
    assert abs(got[10].rrf_score - c(1)) < 1e-12  # min rank wins
    assert got[11].n_sources == 2
    assert abs(got[11].rrf_score - (c(2) + c(1))) < 1e-12


def test_mmr_exclude_self_flag(spark):
    """exclude_self=False keeps a corpus row whose id collides with the
    query id (disjoint namespaces); the default drops it."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    with_self = mmr_rerank(
        corpus, queries, k_candidates=3, k_select=3, exclude_self=False
    ).collect()
    without = mmr_rerank(
        corpus, queries, k_candidates=3, k_select=3
    ).collect()
    assert {r.vec_id for r in with_self} == {1, 2, 3}
    assert {r.vec_id for r in without} == {2, 3}
    # with the collision kept, the identical vector is the step-1 pick
    assert [r.vec_id for r in sorted(with_self, key=lambda r: r.step)][0] == 1


def test_mmr_driver_loop_equals_distributed(spark):
    """The cost-based driver greedy (round-9 optimization) must be
    decision-for-decision identical to the distributed unrolled loop —
    same picks, same step order, same IEEE output doubles."""
    import math
    import random

    from pyspark.sql import Row

    from music_streaming_data_pipeline_v2_spark.operators.retrieval import (
        mmr_rerank,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(6)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append(Row(vec_id=i, embedding=[float(x / n) for x in v]))
    emb = spark.createDataFrame(rows)
    qv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fast = mmr_rerank(emb, qv, k_candidates=9, k_select=4).collect()
    slow = mmr_rerank(
        emb, qv, k_candidates=9, k_select=4, driver_threshold=None
    ).collect()
    key = lambda r: (r.query_id, r.step)
    assert {key(r): (r.vec_id, r.relevance, r.mmr_score) for r in fast} == {
        key(r): (r.vec_id, r.relevance, r.mmr_score) for r in slow
    }
    assert fast and len(fast) == len(slow)


def test_mmr_driver_loop_string_ids(spark):
    """The driver greedy must handle non-numeric ids (ADVICE r9): the
    tie-break is min over (-score, id), so any orderable id type works
    exactly like the distributed path's F.asc tie-break."""
    rows = [
        ("q", [1.0, 0.0, 0.0]),
        ("a", [0.99, 0.14, 0.0]),
        ("b", [0.99, 0.14, 0.0]),  # exact duplicate of a: id tie
        ("c", [0.7, 0.0, 0.71]),
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    qv = emb.filter("vec_id = 'q'").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fast = mmr_rerank(emb, qv, k_candidates=3, k_select=3, lam=0.5).collect()
    slow = mmr_rerank(
        emb, qv, k_candidates=3, k_select=3, lam=0.5, driver_threshold=None
    ).collect()
    key = lambda r: (r.query_id, r.step)
    assert {key(r): (r.vec_id, r.relevance, r.mmr_score) for r in fast} == {
        key(r): (r.vec_id, r.relevance, r.mmr_score) for r in slow
    }
    # the score tie between a and b breaks by id ascending on BOTH paths
    assert [r.vec_id for r in sorted(fast, key=lambda r: r.step)][0] == "a"


def test_mmr_large_k_candidates_takes_distributed_path(spark):
    """driver_threshold bounds the PAIR collect too (VERDICT r9 #8):
    with k_candidates large enough that |cand|·k_candidates exceeds
    the budget, the probe must route to the distributed loop — and the
    result must be unchanged."""
    from unittest import mock

    rows = [
        (i, [math.cos(i * 0.37 + d) for d in range(4)]) for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qv = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # threshold 100 with k_candidates=800 ⇒ cand_cap = 100*15//799 = 1,
    # so the probe (2 queries × candidates > 1 row) must bail to the
    # distributed loop; spy on createDataFrame to prove no driver-built
    # result was returned.
    with mock.patch.object(
        spark, "createDataFrame", wraps=spark.createDataFrame
    ) as cdf:
        out = mmr_rerank(
            emb, qv, k_candidates=800, k_select=3, driver_threshold=100
        ).collect()
        driver_built = [
            c for c in cdf.call_args_list if c.args and isinstance(c.args[0], list)
        ]
    assert not driver_built  # distributed path: no collected-rows DF
    want = mmr_rerank(
        emb, qv, k_candidates=800, k_select=3, driver_threshold=None
    ).collect()
    key = lambda r: (r.query_id, r.step)
    assert {key(r): (r.vec_id, r.relevance, r.mmr_score) for r in out} == {
        key(r): (r.vec_id, r.relevance, r.mmr_score) for r in want
    }
