"""Property-based equivalence of cost-selected physical strategies.

The operator-level planners (jaccard_pairs' bitmask/prefix/allpairs,
connected_components' driver/distributed) must be RESULT-INVARIANT:
whatever strategy the stats pick, the relation is identical. Hypothesis
drives randomized corpora/graphs through every path and compares.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators import dedup
from music_streaming_data_pipeline_v2_spark.operators.clustering import (
    connected_components,
)

# small vocab → auto picks the bitmask path; the token universe is
# fixed so doc sets overlap heavily (worst case for pruning)
_SMALL_VOCAB = [f"w{i}" for i in range(12)]
# large sparse vocab → prefix path stays competitive
_BIG_VOCAB = [f"tok{i}" for i in range(300)]


@st.composite
def corpus(draw, vocab):
    n_docs = draw(st.integers(min_value=2, max_value=14))
    docs = []
    for i in range(n_docs):
        toks = draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=10)
        )
        docs.append((i, " ".join(toks)))
    return docs


def _pairs(spark, rows, strategy, threshold):
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "blk", F.lit(1)
    )
    got = dedup.jaccard_pairs(
        df, "blk", threshold=threshold, strategy=strategy
    ).collect()
    return {(r.id_a, r.id_b): round(r.jaccard, 12) for r in got}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus(_SMALL_VOCAB), threshold=st.sampled_from([0.34, 0.61, 0.8]))
def test_jaccard_strategies_agree_small_vocab(spark, rows, threshold):
    auto = _pairs(spark, rows, "auto", threshold)       # bitmask path
    allp = _pairs(spark, rows, "allpairs", threshold)   # array path
    assert auto == allp


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus(_BIG_VOCAB), threshold=st.sampled_from([0.34, 0.8]))
def test_jaccard_strategies_agree_big_vocab(spark, rows, threshold):
    prefix = _pairs(spark, rows, "prefix", threshold)
    allp = _pairs(spark, rows, "allpairs", threshold)
    assert prefix == allp


def _containment(spark, rows, strategy, tp):
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "blk", F.lit(1)
    )
    got = dedup.containment_pairs(
        df, "blk", threshold_permille=tp, strategy=strategy
    ).collect()
    return {(r.id_a, r.id_b): round(r.containment, 12) for r in got}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus(_SMALL_VOCAB), tp=st.sampled_from([340, 600, 1000]))
def test_containment_strategies_agree_small_vocab(spark, rows, tp):
    # auto fires the bitmask all-pairs path on the 12-token vocabulary;
    # prefix is the one-sided prefix-filter join — identical directed
    # pair sets and bit-identical containment doubles required.
    auto = _containment(spark, rows, "auto", tp)
    prefix = _containment(spark, rows, "prefix", tp)
    assert auto == prefix


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_driver_equals_distributed(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    drv = {
        (r["id"], r["component"])
        for r in connected_components(df).collect()
    }
    dist = {
        (r["id"], r["component"])
        for r in connected_components(df, driver_edge_threshold=0).collect()
    }
    assert drv == dist


@st.composite
def _doc_pair_with_overlap(draw):
    """Two random docs sharing a random >= 6-token substring."""
    vocab = [f"v{i}" for i in range(50)]
    shared = draw(st.lists(st.sampled_from(vocab), min_size=6, max_size=12))
    pre_a = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=8))
    post_a = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=8))
    pre_b = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=8))
    post_b = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=8))
    return (
        " ".join(pre_a + shared + post_a),
        " ".join(pre_b + shared + post_b),
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=_doc_pair_with_overlap())
def test_winnow_overlap_guarantee_fuzz(spark, pair):
    """Winnowing guarantee (Schleimer et al.): any shared substring of
    >= window + k - 1 tokens must contribute >= 1 common fingerprint,
    for ANY surrounding context."""
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        winnow_fingerprints,
    )

    a, b = pair
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = winnow_fingerprints(df, k=3, window=4)
    sk = {}
    for r in out.collect():
        sk.setdefault(r.doc_id, set()).add(r.fp)
    assert sk.get(1, set()) & sk.get(2, set())


@st.composite
def _shingle_corpus(draw):
    vocab = [f"w{i}" for i in range(25)]
    n_docs = draw(st.integers(min_value=1, max_value=10))
    rows = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=20))
        rows.append((i, " ".join(toks)))
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_shingle_corpus(), k=st.sampled_from([2, 3, 5]))
def test_hashed_shingles_match_string_shingles(spark, rows, k):
    """hashed_word_shingles must be a bijective image of word_shingles
    on any real corpus: same per-doc distinct COUNT (so every Jaccard
    numerator/denominator is identical), and equal string shingle sets
    imply equal hashed sets across docs (so pair mining sees the same
    candidate geometry). A 64-bit collision would break the count
    equality; this fuzz guards the equivalence claim the MinHash
    pipeline now rests on."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    both = df.select(
        "doc_id",
        dedup.word_shingles("text", k).alias("s"),
        dedup.hashed_word_shingles("text", k).alias("h"),
    ).collect()
    str_sets = {}
    hash_sets = {}
    for r in both:
        assert len(set(r.s)) == len(set(r.h)), "collision or drift"
        str_sets[r.doc_id] = frozenset(r.s)
        hash_sets[r.doc_id] = frozenset(r.h)
    for a in str_sets:
        for b in str_sets:
            # equal string sets <=> equal hashed sets (both directions)
            assert (str_sets[a] == str_sets[b]) == (
                hash_sets[a] == hash_sets[b]
            )
            # jaccard equality on every pair
            sa, sb = str_sets[a], str_sets[b]
            ha, hb = hash_sets[a], hash_sets[b]
            if sa | sb:
                assert len(sa & sb) == len(ha & hb)
                assert len(sa | sb) == len(ha | hb)


# --- sampling determinism: the engine-portability claims of the DSIR /
# temperature operators are partition- and plan-shape-invariance; fuzz
# them with randomized corpora across different physical layouts.

_WORDS = [f"v{i}" for i in range(30)]


@st.composite
def doc_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    rows = []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8))
        lang = draw(st.sampled_from(["en", "fr", "zh"]))
        rows.append((i, " ".join(toks), lang))
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=doc_corpus(), split=st.integers(min_value=1, max_value=3))
def test_dsir_weights_partition_invariant(spark, rows, split):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        dsir_importance,
    )

    raw = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = spark.createDataFrame(
        rows[:split], "doc_id long, text string, lang string"
    )
    one = {
        (r.doc_id, r.n_feats, r.log_weight)
        for r in dsir_importance(raw.coalesce(1), target).collect()
    }
    many = {
        (r.doc_id, r.n_feats, r.log_weight)
        for r in dsir_importance(raw.repartition(7), target.repartition(5)).collect()
    }
    assert one == many


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=doc_corpus())
def test_temperature_sample_partition_invariant(spark, rows):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    one = {
        (r.doc_id, r.rate)
        for r in temperature_sample(df.coalesce(1), "lang", "doc_id").collect()
    }
    many = {
        (r.doc_id, r.rate)
        for r in temperature_sample(
            df.repartition(9), "lang", "doc_id"
        ).collect()
    }
    assert one == many


@st.composite
def _packing_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        stratum = draw(st.sampled_from(["s0", "s1", "s2"]))
        k = draw(st.integers(min_value=0, max_value=30))
        rows.append((i, stratum, " ".join("w" for _ in range(k))))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_packing_corpus(), budget=st.integers(min_value=1, max_value=20))
def test_nfd_packing_matches_python_reference(spark, rows, budget):
    """pack_bins_nfd (sorted-partition pandas recurrence kernel) must
    equal a plain sequential Python reference on any corpus, any
    budget — including zero-token docs and over-budget docs."""
    from music_streaming_data_pipeline_v2_spark.operators.packing import (
        pack_bins_nfd,
    )

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.stratum, r.doc_id): (r.n_tokens, r.bin_id, r.bin_fill)
        for r in pack_bins_nfd(df, budget=budget).collect()
    }

    # reference: per stratum, sort by (n_tokens desc, id), next-fit scan
    want = {}
    by_stratum: dict = {}
    for i, stratum, text in rows:
        n = len([t for t in text.split() if t])
        by_stratum.setdefault(stratum, []).append((n, i))
    for stratum, docs in by_stratum.items():
        docs.sort(key=lambda t: (-t[0], t[1]))
        b, fill = 0, 0
        for n, i in docs:
            if fill > 0 and fill + n > budget:
                b, fill = b + 1, 0
            fill += n
            want[(stratum, i)] = (n, b, fill)
    assert got == want


@st.composite
def _mmr_instance(draw):
    n = draw(st.integers(min_value=3, max_value=12))
    dims = 4
    vecs = []
    for i in range(n):
        v = [
            draw(
                st.integers(min_value=-4, max_value=4)
            )  # integer grid → exact doubles, no parse drift
            for _ in range(dims)
        ]
        if all(x == 0 for x in v):
            v[0] = 1
        vecs.append((i, [float(x) for x in v]))
    return vecs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_mmr_instance())
def test_mmr_matches_python_greedy(spark, vecs):
    """mmr_rerank (unrolled static DataFrame plan) must follow the
    exact greedy path of a sequential Python reference: similarities
    pinned to 6-dp integers once, every derived score exact BIGINT
    λ-arithmetic, id tie-breaks. (The first version of this fuzz
    caught a real hazard: rounding the λ-combination of two 6-dp
    DOUBLES lands exactly on the 7th-decimal boundary for ~10% of
    inputs, where half-up vs half-even conventions diverge — the
    operator now never rounds a computed score.)"""
    import math

    from music_streaming_data_pipeline_v2_spark.operators.retrieval import (
        mmr_rerank,
    )

    lam, kc, ks = 0.7, 5, 3
    lam_i, one_m_i = 700000, 300000
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [
        (r.step, r.vec_id, r.mmr_score)
        for r in mmr_rerank(
            emb, q, k_candidates=kc, k_select=ks, lam=lam
        ).collect()
    ]
    got.sort()

    # Python reference mirroring the operator's integer arithmetic
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return None if na * nb == 0 else d / (na * nb)

    def c6i(x):  # half-away-from-zero at 6 dp, as a plain int
        v = x * 1e6
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    byid = dict(vecs)
    qv = byid[0]
    simq = {}
    for i, v in vecs:
        if i == 0:
            continue
        c = cos(qv, v)
        if c is not None:
            simq[i] = c6i(c)
    cand = sorted(simq, key=lambda i: (-simq[i], i))[:kc]
    want = []
    selected = []
    for step in range(1, ks + 1):
        best = None  # (id, score_i or None, reported)
        for i in cand:
            if i in selected:
                continue
            if step == 1:
                key, rep = simq[i], simq[i] / 1e6
            else:
                maxsim = max(c6i(cos(byid[i], byid[s])) for s in selected)
                key = lam_i * simq[i] - one_m_i * maxsim
                rep = key / 1e12
            if best is None or (-key, i) < (-best[1], best[0]):
                best = (i, key, rep)
        if best is None:
            break
        selected.append(best[0])
        want.append((step, best[0], best[2]))
    assert got == want


@st.composite
def _intervals(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    rows = []
    for i in range(n):
        s = draw(st.integers(min_value=0, max_value=5000))
        ln = draw(st.integers(min_value=0, max_value=4000))
        rows.append((i, s, s + ln))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=_intervals(),
    bucket=st.sampled_from([1, 7, 100, 1000]),
    min_ov=st.sampled_from([0, 1, 500]),
)
def test_interval_overlap_blocked_equals_naive(spark, rows, bucket, min_ov):
    """interval_overlap_pairs (bucket-blocked hash join) must equal
    the naive quadratic overlap join for any intervals, any bucket
    width, any overlap threshold — accelerator equivalence."""
    from music_streaming_data_pipeline_v2_spark.operators.asof import (
        interval_overlap_pairs,
    )

    df = spark.createDataFrame(rows, "iid long, s long, e long")
    got = {
        (r.id_a, r.id_b): r.overlap_seconds
        for r in interval_overlap_pairs(
            df, "iid", "s", "e", bucket_seconds=bucket,
            min_overlap_seconds=min_ov,
        ).collect()
    }
    want = {}
    for i, si, ei in rows:
        for j, sj, ej in rows:
            if i < j and si <= ej and sj <= ei:
                ov = min(ei, ej) - max(si, sj) + 1
                if ov >= min_ov:
                    want[(i, j)] = ov
    assert got == want


@st.composite
def _rankings(draw):
    """2-3 sources of per-query rankings with dense unique ranks."""
    n_sources = draw(st.integers(min_value=2, max_value=3))
    out = []
    for _ in range(n_sources):
        rows = []
        for q in range(draw(st.integers(min_value=1, max_value=3))):
            docs = draw(
                st.lists(
                    st.integers(min_value=0, max_value=15),
                    unique=True,
                    min_size=1,
                    max_size=6,
                )
            )
            rows.extend((q, r + 1, d) for r, d in enumerate(docs))
        out.append(rows)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sources=_rankings(), c=st.sampled_from([10, 60]))
def test_rrf_fuse_matches_python_reference(spark, sources, c):
    from music_streaming_data_pipeline_v2_spark.operators.retrieval import (
        rrf_fuse,
    )

    dfs = {
        f"s{i}": spark.createDataFrame(
            rows, "query_id int, rank int, doc_id long"
        )
        for i, rows in enumerate(sources)
    }
    got = {
        (r.query_id, r.doc_id): (r.rank, r.rrf_score, r.n_sources)
        for r in rrf_fuse(dfs, k=100, c=c).collect()
    }

    acc: dict = {}
    for rows in sources:
        for q, r, d in rows:
            ci, ns = acc.get((q, d), (0, 0))
            acc[(q, d)] = (ci + round(1e9 / (c + r)), ns + 1)
    want = {}
    by_q: dict = {}
    for (q, d), (ci, ns) in acc.items():
        by_q.setdefault(q, []).append((d, ci, ns))
    for q, items in by_q.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for pos, (d, ci, ns) in enumerate(items, start=1):
            want[(q, d)] = (pos, ci / 1e9, ns)
    assert got == want


@st.composite
def _metrics_instance(draw):
    n_corpus = draw(st.integers(min_value=3, max_value=12))
    labels = [(i, draw(st.integers(min_value=0, max_value=2))) for i in range(n_corpus)]
    ranking = []
    for q in range(draw(st.integers(min_value=1, max_value=3))):
        nbrs = draw(
            st.lists(
                st.integers(min_value=0, max_value=n_corpus - 1),
                unique=True,
                min_size=1,
                max_size=min(5, n_corpus),
            )
        )
        ranking.extend((q, r + 1, n) for r, n in enumerate(nbrs))
    # every query id must carry a label (queries are corpus members)
    return labels, ranking


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(inst=_metrics_instance(), k=st.sampled_from([3, 5]))
def test_retrieval_metrics_matches_python_reference(spark, inst, k):
    import math

    from music_streaming_data_pipeline_v2_spark.operators.retrieval import (
        retrieval_metrics,
    )

    labels, ranking = inst
    rdf = spark.createDataFrame(
        ranking, "query_id long, rank int, neighbor_id long"
    )
    ldf = spark.createDataFrame(labels, "vec_id long, label int")
    got = {
        r.query_id: (r.n_relevant, r.first_rel_rank, r.mrr, r.ndcg)
        for r in retrieval_metrics(rdf, ldf, k=k).collect()
    }

    lab = dict(labels)
    class_n: dict = {}
    for _, l in labels:
        class_n[l] = class_n.get(l, 0) + 1

    def t(i):
        return round(1e9 / math.log2(i + 1))

    want = {}
    for q in {q for q, _, _ in ranking}:
        if q not in lab:
            continue
        n_rel = class_n[lab[q]] - 1
        hits = [
            (r, 1 if lab.get(n) == lab[q] else 0)
            for qq, r, n in ranking
            if qq == q and r <= k
        ]
        rel_ranks = [r for r, rel in hits if rel]
        frr = min(rel_ranks) if rel_ranks else None
        mrr = 1.0 / frr if frr else 0.0
        dcg = sum(t(r) for r in rel_ranks)
        idcg = sum(t(i) for i in range(1, min(n_rel, k) + 1)) if n_rel > 0 else 0
        ndcg = dcg / idcg if idcg > 0 else None
        want[q] = (n_rel, frr, mrr, ndcg)
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=list("ab cde\txyz"), min_size=0, max_size=24
        ),
        min_size=1,
        max_size=8,
    )
)
def test_char_entropy_matches_python_reference(spark, texts):
    import math

    from music_streaming_data_pipeline_v2_spark.operators.text import (
        char_entropy,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(df).collect()
    }
    want = {}
    for i, t in rows:
        if len(t) == 0:
            continue
        counts: dict = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        h = sum(
            round(-(c / n) * math.log2(c / n) * 1e9) for c in counts.values()
        )
        want[i] = (n, h / 1e9)
    assert got == want


# ---------------------------------------------------------------------------
# group_cap_sample: bucket-threshold two-phase ≡ naive rank window
# ---------------------------------------------------------------------------


@st.composite
def grouped_ids(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    groups = ["g0", "g1", "g2", None]
    return [
        (i, draw(st.sampled_from(groups))) for i in range(n)
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=grouped_ids(),
    cap=st.integers(min_value=1, max_value=12),
    digits=st.integers(min_value=1, max_value=3),
)
def test_group_cap_two_phase_equals_window(spark, rows, cap, digits):
    from pyspark.sql import Window

    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        group_cap_sample,
    )

    df = spark.createDataFrame(rows, "id long, grp string")
    key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    got = sorted(
        (
            (r["grp"], r["id"])
            for r in group_cap_sample(
                df, "grp", "id", cap, bucket_hex_digits=digits
            ).collect()
        ),
        key=key,
    )
    h = F.md5(F.concat(F.lit("c|"), F.col("id").cast("string")))
    w = Window.partitionBy("grp").orderBy(h, F.col("id"))
    want = sorted(
        (
            (r["grp"], r["id"])
            for r in df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .collect()
        ),
        key=key,
    )
    assert got == want
