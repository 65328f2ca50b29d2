"""Round-5 operators: BM25 retrieval, unigram-LM scoring, PII scan,
weighted deterministic sampling."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.sampling import (
    hash_uniform,
    weighted_sample,
)
from music_streaming_data_pipeline_v2_spark.operators.text import (
    bm25_topk,
    pii_redact,
    pii_scan,
    unigram_logprob_score,
)


def test_bm25_ranks_exact_match_first(spark):
    corpus = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry cherry"),
            (4, "durian"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "apple"), (1, "cherry banana")], "query_id int, text string"
    )
    out = bm25_topk(corpus, queries, k=3)
    rows = {(r.query_id, r.rank): r for r in out.collect()}
    # 'apple' appears only in doc 1
    assert rows[(0, 1)].doc_id == 1 and (0, 2) not in rows
    # banana also lives in doc 1, so all three match — but doc 2
    # (both query terms, shortest) must outrank tf-saturated doc 3
    got_q1 = [rows[(1, i)].doc_id for i in range(1, 4) if (1, i) in rows]
    assert set(got_q1) == {1, 2, 3} and rows[(1, 1)].doc_id == 2
    # scores are positive and strictly rank-ordered
    for q in (0, 1):
        scores = [rows[(q, i)].score for i in range(1, 4) if (q, i) in rows]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


def test_bm25_hand_computed_score(spark):
    """One-term, one-doc corpus: score must equal the closed form."""
    corpus = spark.createDataFrame([(7, "x x y")], "doc_id long, text string")
    queries = spark.createDataFrame([(0, "x")], "query_id int, text string")
    r = bm25_topk(corpus, queries, k=1, k1=1.2, b=0.75).collect()[0]
    # N=1, df=1 → idf = ln(1 + 0.5/1.5); tf=2, dl=3, avgdl=3 → denom=tf+k1
    want = math.log(1 + 0.5 / 1.5) * (2 * 2.2) / (2 + 1.2)
    assert abs(r.score - round(want * 1e9) / 1e9) < 1e-12


def test_unigram_lm_scores_reference_like_text_higher(spark):
    lm = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(100, "the cat sat"), (101, "zq zz qqq")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob_score(scored, lm).collect()}
    assert out[100].avg_logprob > out[101].avg_logprob
    assert out[100].n_tokens == 3 and out[101].n_tokens == 3
    # unseen tokens get exactly ln(1 / (total + V)): total=30, V=5
    assert abs(
        out[101].avg_logprob - round(math.log(1 / 35.0) * 1e9) / 1e9
    ) < 1e-12


def test_pii_scan_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b%c@sub.example.org and b@x.io now"),
            (2, "call +1 (555) 010-2233 or 555 123 4567"),
            (3, "from 192.168.0.1 to 10.0.0.255"),
            (4, "perfectly clean text"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scan(df).collect()}
    assert (out[1].n_email, out[1].has_pii) == (2, True)
    assert out[2].n_phone == 2 and out[2].has_pii
    assert out[3].n_ipv4 == 2 and out[3].has_pii
    assert (out[4].n_email, out[4].n_phone, out[4].n_ipv4, out[4].has_pii) == (
        0, 0, 0, False,
    )
    red = {r.doc_id: r.text_redacted for r in pii_redact(df).collect()}
    assert red[1] == "mail [EMAIL] and [EMAIL] now"
    assert "[PHONE]" in red[2] and "555" not in red[2]
    assert red[3] == "from [IPV4] to [IPV4]"
    assert red[4] == "perfectly clean text"


def test_weighted_sample_deterministic_and_edge_weights(spark):
    df = spark.createDataFrame(
        [(i, 0.0 if i % 3 == 0 else (1.0 if i % 3 == 1 else 0.5))
         for i in range(300)],
        "k long, w double",
    )
    kept = {r.k for r in weighted_sample(df, "w", "k").collect()}
    # weight 0 never keeps, weight 1 always keeps
    assert not any(k % 3 == 0 for k in kept)
    assert all(k in kept for k in range(300) if k % 3 == 1)
    # half-weight keeps roughly half (deterministic, so exact per seed set)
    half = [k for k in kept if k % 3 == 2]
    assert 25 <= len(half) <= 75
    # pure function of (key, weight): identical on re-run and repartition
    again = {r.k for r in weighted_sample(df.repartition(7), "w", "k").collect()}
    assert again == kept


def test_hash_uniform_range_and_stability(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    vals = [r.u for r in df.select(hash_uniform("k").alias("u")).collect()]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.4 < sum(vals) / len(vals) < 0.6  # roughly uniform
    assert len(set(vals)) == len(vals)  # 48-bit: no collisions at n=1000


def test_bm25_empty_query_and_no_match(spark):
    corpus = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "nomatch"), (1, "   ")], "query_id int, text string"
    )
    assert bm25_topk(corpus, queries, k=5).count() == 0


def test_template_ngrams_finds_planted_boilerplate(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        template_ngrams,
    )

    boiler = "subscribe to our newsletter today"
    rows = [(i, "a", f"unique{i} body text {i} " + boiler) for i in range(10)]
    rows += [(100 + i, "a", f"clean{i} different words here now") for i in range(10)]
    rows += [(200 + i, "b", f"other{i} stratum text entirely") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = template_ngrams(df, n=4, min_doc_frac=0.4, stratum_col="source")
    got = {(r.stratum, r.gram): r for r in out.collect()}
    # the planted 5-token boilerplate yields two 4-grams in stratum a,
    # each in 10/20 docs
    for gram in ("subscribe to our newsletter", "to our newsletter today"):
        r = got[("a", gram)]
        assert (r.doc_freq, r.n_docs, r.doc_frac) == (10, 20, 0.5)
    # nothing repeats enough in stratum b
    assert not any(s == "b" for s, _ in got)


def test_weighted_sample_monotone_in_weight(spark):
    """Raising a row's weight can never DROP it: the coin is fixed per
    key, only the threshold moves — the property that makes iterative
    weight tuning stable (hypothesis-driven over random weight pairs)."""
    from hypothesis import given, settings, strategies as st

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")

    @settings(max_examples=10, deadline=None)
    @given(
        lo=st.floats(min_value=0.0, max_value=1.0),
        hi=st.floats(min_value=0.0, max_value=1.0),
    )
    def check(lo, hi):
        lo, hi = min(lo, hi), max(lo, hi)
        a = {r.k for r in weighted_sample(df.withColumn("w", F.lit(lo)), "w", "k").collect()}
        b = {r.k for r in weighted_sample(df.withColumn("w", F.lit(hi)), "w", "k").collect()}
        assert a <= b

    check()


def test_bm25_matches_reference_implementation(spark):
    """Property check against a plain-Python BM25 on a random-ish tiny
    corpus: same ranking, same 9-dp scores."""
    import itertools

    vocab = ["red", "green", "blue", "cyan", "gold"]
    docs = [
        (i, " ".join(vocab[(i + j) % 5] for j in range((i % 7) + 1)))
        for i in range(30)
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(0, "red blue"), (1, "gold gold cyan")], "query_id int, text string"
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in bm25_topk(corpus, queries, k=5).collect()
    }

    # reference implementation
    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    dl = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dl.values()) / N
    dfreq = {}
    for t in set(itertools.chain.from_iterable(toks.values())):
        dfreq[t] = sum(1 for ts in toks.values() if t in ts)
    k1, b = 1.2, 0.75
    for qid, qtext in [(0, "red blue"), (1, "gold gold cyan")]:
        scores = {}
        for i in toks:
            s = 0
            for t in set(qtext.split()):
                tf = toks[i].count(t)
                if not tf:
                    continue
                idf = math.log(1 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += round(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl[i] / avgdl)) * 1e9)
            if s:
                scores[i] = s
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rank, (doc, si) in enumerate(want, 1):
            gd, gs = got[(qid, rank)]
            assert gd == doc and abs(gs - si / 1e9) < 1e-12


def test_sampling_passes_are_decorrelated_from_split(spark):
    """Composition regression (found by the curation demo): every
    sampling coin is salted differently from the split digest, so
    rebalance/thin-then-split keeps val/test populated. Unsalted,
    balanced_sample's b < frac·256 filter selected exactly the
    low-bucket (train) region and the demo's val/test came out EMPTY."""
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        balanced_sample,
        dataset_split,
        hash_sample,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    for thinned in (
        balanced_sample(df, "src", "doc_id"),          # ~200 survivors
        hash_sample(df, "doc_id", 64),                 # ~250 survivors
        weighted_sample(df.withColumn("w", F.lit(0.25)), "w", "doc_id"),
    ):
        n = thinned.count()
        splits = {
            r["split"]: r["n"]
            for r in dataset_split(thinned, "doc_id")
            .groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert n > 100
        # ~20% should land outside train; correlated coins gave 0
        outside = splits.get("val", 0) + splits.get("test", 0)
        assert outside > n * 0.08, (splits, n)


def test_pq_encode_decode_roundtrip_and_adc(spark):
    """PQ on a constructed corpus where the nearest sub-centroid is
    unambiguous: codes are the planted ones; ADC distance equals the
    hand-computed table sum; a vector equal to a seed encodes to that
    seed's code in every subspace with ADC distance 0 to itself."""
    import math as _m

    from music_streaming_data_pipeline_v2_spark.operators import (
        similarity as sim,
    )

    # 4 dims, m=2 subspaces of 2; corpus of 6 vectors
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [1.0, 1.0, -10.0, -10.0]),
        (2, [0.1, 0.1, 9.5, 9.9]),
        (3, [0.9, 1.1, -9.9, -10.2]),
        (4, [0.0, 1.0, 10.0, -10.0]),
        (5, [1.0, 0.0, -10.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = sim.pq_codebooks(df, m=2, n_codes=4)
    codes = {r.id: r.pq_code for r in sim.pq_encode(df, cbs).collect()}
    # a seed vector must encode to its own sub-centroids, so decoding
    # its code and re-reading the codebook reproduces the vector
    seeds = sim.seed_vectors(df, 4)
    for sid, vec in enumerate(seeds):
        enc = [r for r in rows if list(map(float, r[1])) == vec]
        code = codes[enc[0][0]]
        rebuilt = cbs[0][code & 15] + cbs[1][(code >> 4) & 15]
        assert rebuilt == vec

    queries = spark.createDataFrame(
        [(0, [0.05, 0.05, 9.9, 9.9])], "query_id int, embedding array<double>"
    )
    top = sim.pq_topk(sim.pq_encode(df, cbs), queries, cbs, k=3).collect()
    got = [(r.rank, r.doc_id) for r in top]
    # hand-compute: adist(q, d) = Σ_s ||q_s - centroid(code_s(d))||²
    def sub(v, s):
        return v[2 * s : 2 * s + 2]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    q = [0.05, 0.05, 9.9, 9.9]
    want = []
    for vid, v in rows:
        cs = [
            min(range(4), key=lambda c: (d2(sub(v, s), cbs[s][c]), c))
            for s in range(2)
        ]
        want.append(
            (vid, sum(round(d2(sub(q, s), cbs[s][cs[s]]) * 1e9) for s in range(2)))
        )
    want.sort(key=lambda t: (t[1], t[0]))
    assert got == [(i + 1, want[i][0]) for i in range(3)]
    # the best match's adist matches the closed form to 1e-9 scaling
    assert abs(top[0].adist - want[0][1] / 1e9) < 1e-12


def test_pq_encode_ragged_vector_gets_null_code(spark):
    from music_streaming_data_pipeline_v2_spark.operators import (
        similarity as sim,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [1.0])],
        "vec_id long, embedding array<double>",
    )
    cbs = sim.pq_codebooks(df.filter("vec_id = 0"), m=2, n_codes=1)
    out = {r.id: r.pq_code for r in sim.pq_encode(df, cbs).collect()}
    assert out[0] is not None and out[1] is None


def test_ivfpq_candidates_come_from_probed_cells_only(spark):
    """IVFADC returns exactly pq_topk's ranking RESTRICTED to members
    of the query's nprobe nearest cells — the pruning contract."""
    from music_streaming_data_pipeline_v2_spark.operators import (
        similarity as sim,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cbs = sim.pq_codebooks(emb, m=8, n_codes=16)
    cents = sim.seed_vectors(emb, 8)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.adist)
        for r in sim.ivfpq_topk(emb, queries, cents, cbs, k=5, nprobe=2).collect()
    }
    # reference: full ADC ranking filtered to the probed cells' members
    cells = {
        r.id: r.centroid_id
        for r in sim.assign_centroid(emb, cents).select(
            F.col("vec_id").alias("id"), "centroid_id"
        ).collect()
    }
    codes = sim.pq_encode(emb, cbs)
    full = sim.pq_topk(codes, queries, cbs, k=10**6).collect()
    qcells = {
        r.query_id: r.centroid_id
        for r in sim.assign_centroid(
            queries, cents, "embedding"
        ).select("query_id", "centroid_id").collect()
    }
    # probe sets: recompute with the operator's own scorer ordering
    import math as _m

    def probe_set(qvec, n=2):
        scores = []
        for i, c in enumerate(cents):
            nc = _m.sqrt(sum(x * x for x in c))
            dot = 0.0
            for a, b in zip(qvec, c):
                dot += float(a) * float(b)
            scores.append((dot / nc, -i, i))
        return {cid for _, _, cid in sorted(scores, reverse=True)[:n]}

    qvecs = {r.query_id: list(r.embedding) for r in queries.collect()}
    for qid in qvecs:
        probed = probe_set(qvecs[qid])
        want = [
            (r.doc_id, r.adist)
            for r in sorted(full, key=lambda r: r.rank)
            if r.query_id == qid and cells[r.doc_id] in probed
        ][:5]
        assert [got[(qid, i + 1)] for i in range(len(want))] == want


def test_pq_encode_matches_python_reference_fuzz(spark):
    """The rankdist argmin (‖c‖² − 2·v·c) must pick the same code as a
    Python replay of the identical IEEE operation order — including on
    negative, zero, and duplicate vectors where d' values collide
    (ties → lowest cid). Fuzzed over random small corpora."""
    from hypothesis import given, settings, strategies as st

    from music_streaming_data_pipeline_v2_spark.operators import (
        similarity as sim,
    )

    vec = st.lists(
        st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
        min_size=8, max_size=8,
    )

    @settings(max_examples=5, deadline=None)
    @given(vecs=st.lists(vec, min_size=4, max_size=10))
    def check(vecs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        m, sub = 2, 4
        cbs = sim.pq_codebooks(df, m=m, n_codes=min(4, len(rows)))
        got = {r.id: r.pq_code for r in sim.pq_encode(df, cbs).collect()}

        def rankdist(v, c, off):
            cc = sim._pq_cc(c)
            dot = 0.0
            for j, cj in enumerate(c):
                dot += float(v[off + j]) * float(cj)
            return cc - (2.0 * dot)

        for vid, v in rows:
            code = 0
            for s in range(m):
                best = min(
                    range(len(cbs[s])),
                    key=lambda ci: (rankdist(v, cbs[s][ci], s * sub), ci),
                )
                code += best << (4 * s)
            assert got[vid] == code, (vid, got[vid], code)

    check()


def test_weighted_sample_null_weight_never_keeps(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None)], "k long, w double"
    )
    assert {r.k for r in weighted_sample(df, "w", "k").collect()} == {1}


def test_duplicated_spans_planted_passage(spark):
    """A passage shared verbatim by two docs must produce exactly one
    maximal span in each, covering precisely the passage's tokens;
    cross-doc semantics: a WITHIN-doc repetition alone yields nothing."""
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        duplicated_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    rows = [
        (0, "alpha beta " + shared + " gamma"),        # span at tokens 2..10
        (1, shared + " delta epsilon"),                # span at tokens 0..8
        (2, "zeta eta theta iota kappa nothing here"),
        # within-doc repetition only — 5-gram repeats inside ONE doc
        (3, "rep one two three four rep one two three four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_span_tokens)
        for r in duplicated_spans(df, min_tokens=5).collect()
    }
    assert spans[0] == (2, 10, 9)
    assert spans[1] == (0, 8, 9)
    assert 2 not in spans and 3 not in spans

    # two disjoint shared passages in one doc → two separate spans
    df2 = spark.createDataFrame(
        [
            (0, shared + " filler words in between " + shared),
            (1, shared),
        ],
        "doc_id long, text string",
    )
    rows2 = sorted(
        (r.span_start, r.span_end)
        for r in duplicated_spans(df2, min_tokens=5).collect()
        if r.doc_id == 0
    )
    assert rows2 == [(0, 8), (13, 21)]


def test_dsir_importance_prefers_target_like_docs(spark):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        dsir_importance,
    )

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quick brown fox jumps over the dog"),
            (2, "zxqv wplk mntr ggga hhhb cccx"),
            (3, "quick brown fox"),
        ],
        "doc_id long, text string",
    )
    w = {r.doc_id: r.log_weight for r in dsir_importance(raw, target).collect()}
    assert set(w) == {1, 2, 3}
    # target-vocabulary docs outscore hash-bucket gibberish
    assert w[1] > w[2] and w[3] > w[2]


def test_dsir_gumbel_topk_deterministic_and_bounded(spark):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        dsir_gumbel_topk,
        dsir_importance,
    )

    target = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"alpha beta token{i} gamma") for i in range(20)],
        "doc_id long, text string",
    )
    weights = dsir_importance(raw, target)
    a = dsir_gumbel_topk(weights, k=5).collect()
    b = dsir_gumbel_topk(weights, k=5).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.rank for r in a] == [1, 2, 3, 4, 5]
    # scores descend; ranks align with score order
    scores = [r.score for r in a]
    assert scores == sorted(scores, reverse=True)


def test_temperature_sample_flattens_strata(spark):
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )

    rows = [(i, "big") for i in range(400)] + [(400 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {r.lang: r.rate for r in temperature_rates(df, "lang").collect()}
    # temperature up-weights the low-resource stratum
    assert rates["small"] > rates["big"]
    kept = temperature_sample(df, "lang", "doc_id").collect()
    # deterministic: same call, same membership
    again = temperature_sample(df, "lang", "doc_id").collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)
    # roughly the budgeted half survives (hash coin, so approximate)
    assert 0.3 * 440 < len(kept) < 0.7 * 440
    by = {}
    for r in kept:
        by[r.lang] = by.get(r.lang, 0) + 1
    # flattening: small's survival fraction strictly exceeds big's
    assert by["small"] / 40 > by["big"] / 400


def test_bm25_hard_negatives_excludes_near_dups_of_positive(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        bm25_hard_negatives,
    )

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [
            (1, passage),                                   # the positive
            (2, passage + " extra"),                        # near-dup of it
            (3, "alpha beta unrelated words entirely new distinct thing"),
            (4, "nothing in common with anything at all"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha beta gamma")], "query_id int, text string"
    )
    out = bm25_hard_negatives(corpus, queries, k=4, n=3, max_jaccard=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert 1 not in rows          # the positive is never a negative
    assert 2 not in rows          # near-dup of the positive excluded
    assert 3 in rows              # lexically-distinct candidate survives
    assert rows[3].bm25_rank >= 2
    assert 0.0 <= rows[3].jaccard_with_pos <= 0.5


def test_dedup_lines_first_occurrence_wins(spark):
    from music_streaming_data_pipeline_v2_spark.operators.dedup import (
        dedup_lines,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha one\nshared line\nalpha two"),
            (2, "shared line\nbeta one\nshared line"),
            (3, "   \n\ngamma only"),
            (4, "shared line"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(df).collect()}
    # doc 1 holds the first occurrence of the shared line
    assert out[1].text == "alpha one\nshared line\nalpha two"
    assert out[1].n_dropped == 0
    # doc 2 loses BOTH later occurrences (cross-doc and its own repeat)
    assert out[2].text == "beta one"
    assert out[2].n_lines == 3 and out[2].n_dropped == 2
    # blank lines are normalized away, not deduped
    assert out[3].text == "gamma only" and out[3].n_lines == 1
    # a doc whose every line duplicates earlier content empties out
    assert out[4].text == "" and out[4].n_dropped == 1


def test_leakage_safe_split_no_pair_straddles(spark):
    """The structural guarantee: every near-dup pair shares a split."""
    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        dedup_clusters_auto,
    )
    from music_streaming_data_pipeline_v2_spark.operators.dedup import (
        jaccard_pairs,
    )
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        dataset_split,
    )
    from music_streaming_data_pipeline_v2_spark.io.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cc = dedup_clusters_auto(docs, "lang", "text", "doc_id", 0.8).select(
        "doc_id", "component"
    )
    split = dataset_split(cc, "component")
    pairs = jaccard_pairs(docs, "lang", threshold=0.8)
    straddle = (
        pairs.join(
            split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    assert pairs.count() > 0  # the guarantee is vacuous on a pair-free corpus
    assert straddle.count() == 0
    # every split is populated (the coin actually spreads clusters)
    assert split.select("split").distinct().count() == 3


def test_cluster_representatives_prefers_quality(spark):
    """Argmax picks the higher-distinct-ratio copy, not the min id."""
    from music_streaming_data_pipeline_v2_spark.plans.driver_queries import (
        REGISTRY,
    )

    reps = REGISTRY["cluster_representatives"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = reps.collect()
    # one representative per component, sizes >= 1, drops = size-1
    assert len({r.component for r in rows}) == len(rows)
    assert all(r.cluster_size >= 1 and r.n_dropped == r.cluster_size - 1 for r in rows)
    # at least one multi-doc cluster elects a rep that is NOT the min
    # id (proving the quality order, not id order, decides)
    assert any(r.cluster_size > 1 and r.rep_doc_id != r.component for r in rows)


def test_bigram_logprob_closed_form(spark):
    import math

    from music_streaming_data_pipeline_v2_spark.operators.text import (
        bigram_logprob_score,
    )

    lm = spark.createDataFrame([(100, "a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b a"), (3, "solo")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_logprob_score(docs, lm).collect()}
    # LM: bigram (a,b)=1, ctx a=1; unigrams a=1,b=1, total=2, V=2
    p_seen = 0.7 * 1.0 + 0.3 * (1 + 1) / (2 + 2)
    p_unseen_ctx = 0.3 * (1 + 1) / (2 + 2)  # 'b' never a context
    assert math.isclose(out[1].avg_logprob, math.log(p_seen), rel_tol=1e-8)
    assert math.isclose(
        out[2].avg_logprob, math.log(p_unseen_ctx), rel_tol=1e-8
    )
    assert 3 not in out  # <2 tokens → no transitions to score
    # fluent order must beat the same bag of words scrambled
    assert out[1].avg_logprob > out[2].avg_logprob


def test_char_entropy_hand_computed(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        char_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, "aabb"),   # two classes, p=0.5 each -> H = 1.0
            (2, "abcd"),   # uniform over 4 -> H = 2.0
            (3, "aaaa"),   # single class -> H = 0.0
            (4, ""),       # empty -> no row
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_chars == 4 and abs(got[1].entropy - 1.0) < 1e-9
    assert abs(got[2].entropy - 2.0) < 1e-9
    assert got[3].entropy == 0.0
    # natural text sits between the degenerate run and uniform noise
    mixed = spark.createDataFrame(
        [(9, "the cat sat on the mat")], "doc_id long, text string"
    )
    h = char_entropy(mixed).collect()[0].entropy
    assert 0.0 < h < 4.0


def test_embedding_decontamination_nearest_and_flag(spark):
    from music_streaming_data_pipeline_v2_spark.operators.similarity import (
        embedding_decontamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.7071, 0.7071]),
        ],
        "vec_id long, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [
            (100, [0.99, 0.01]),   # nearest corpus 1, cos ~1 -> flagged
            (101, [-1.0, -1.0]),   # nearest is the least-negative: ties
            (102, [0.0, 0.0]),     # zero-norm -> no row
        ],
        "probe_id long, embedding array<double>",
    )
    got = {
        r.probe_id: r
        for r in embedding_decontamination(
            corpus, probes, threshold=0.9
        ).collect()
    }
    assert set(got) == {100, 101}
    assert got[100].nearest_id == 1 and got[100].contaminated
    # probe 101 is anti-parallel to 3 and equally negative to 1 and 2
    # (cos = -0.7071 each): argmax ties break by corpus id ascending
    assert got[101].nearest_id == 1 and not got[101].contaminated


def test_lm_quality_buckets_terciles_and_head(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        lm_quality_buckets,
    )

    # LM trained on fluent docs; 9 scored docs per lang — terciles are
    # exactly 3/3/3, and the most LM-like doc lands in 'head'
    lm = spark.createDataFrame(
        [(100 + i, "en", "the cat sat on the mat") for i in range(3)],
        "doc_id long, lang string, text string",
    )
    docs = []
    for i in range(9):
        if i < 3:
            text = "the cat sat on the mat"      # fluent
        elif i < 6:
            text = "the mat cat zz qq"           # mixed
        else:
            text = "zz qq xx yy ww vv"           # unseen gibberish
        docs.append((i, "en", text))
    corpus = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r.doc_id: r.bucket for r in lm_quality_buckets(corpus, lm).collect()}
    assert [got[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_interval_overlap_pairs_hand_case(spark):
    from music_streaming_data_pipeline_v2_spark.operators.asof import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150), (3, 200, 300), (4, 100, 100)],
        "iid long, s long, e long",
    )
    got = {
        (r.id_a, r.id_b): r.overlap_seconds
        for r in interval_overlap_pairs(iv, "iid", "s", "e", 7).collect()
    }
    # 1∩2 = [50,100] → 51; 1∩4 = the single shared second; 2∩4 likewise
    assert got == {(1, 2): 51, (1, 4): 1, (2, 4): 1}


def test_nb_classify_tokenless_class_keeps_its_prior(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        nb_classify,
    )

    # class "b" has the larger prior but its training docs carry no
    # tokens — it must still win the prior-argmax for an empty test
    # doc rather than vanish from the class list
    train = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", ""), (3, "b", "   "), (4, "b", "")],
        "doc_id long, source string, text string",
    )
    test = spark.createDataFrame([(10, "")], "doc_id long, text string")
    got = nb_classify(train, test).collect()[0]
    assert got.predicted == "b" and got.n_tokens == 0


def test_lm_quality_buckets_tiny_language_best_doc_is_head(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        lm_quality_buckets,
    )

    lm = spark.createDataFrame(
        [(100, "xx", "aa bb cc")], "doc_id long, lang string, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "xx", "aa bb cc"), (2, "xx", "zz qq")],
        "doc_id long, lang string, text string",
    )
    got = {r.doc_id: r.bucket for r in lm_quality_buckets(corpus, lm).collect()}
    # ceil terciles: a 2-doc language still has a head
    assert got[1] == "head" and got[2] == "middle"


def test_interval_overlap_pairs_poison_row_guard(spark):
    """One malformed interval (epoch-0 sentinel start) must fail the
    query loudly instead of exploding into millions of bucket rows."""
    import pytest
    from music_streaming_data_pipeline_v2_spark.operators.asof import (
        interval_overlap_pairs,
    )

    iv = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 10_000_000)], "iid long, s long, e long"
    )
    bad = interval_overlap_pairs(
        iv, "iid", "s", "e", bucket_seconds=7, max_buckets_per_interval=1000
    )
    with pytest.raises(Exception, match="spans more than 1000 buckets"):
        bad.collect()
    # raising the cap (or sane data) still works end-to-end
    ok = interval_overlap_pairs(
        iv, "iid", "s", "e", bucket_seconds=7,
        max_buckets_per_interval=2_000_000,
    )
    assert {(r.id_a, r.id_b) for r in ok.collect()} == {(1, 2)}
