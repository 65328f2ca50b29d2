"""Round-6 operator tests: the end-to-end curation recipe
(operators/curation.py) — invariants the oracle hash can't state
directly. The hash-exact DuckDB replay lives in the registry
(`curation_recipe_e2e`, checked by tests/test_oracle_parity.py)."""

import pytest
from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.curation import (
    curation_recipe,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET, EPOCHS = 6_001, 3


@pytest.fixture(scope="module")
def recipe(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation_recipe(
        docs, BUDGET, EPOCHS, min_tokens=20, min_uniq_permille=320
    ).localCheckpoint()
    return out


def test_heldout_splits_never_epoched(recipe):
    assert (
        recipe.filter(
            (F.col("split") != "train") & (F.col("repeat_count") != 0)
        ).count()
        == 0
    )


def test_all_three_splits_live(recipe):
    splits = {r["split"] for r in recipe.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_repeat_cap_respected(recipe):
    # UniMax caps every source at EPOCHS passes, and the epoch-mix
    # remainder prefix adds at most 1 — so no doc repeats > EPOCHS
    # (a capped source's budget is exactly EPOCHS * its tokens: whole
    # epochs = EPOCHS, remainder 0)
    assert recipe.agg(F.max("repeat_count")).first()[0] <= EPOCHS


def test_mixed_tokens_hit_budget_within_overshoot(recipe):
    # greedy remainder prefix overshoots by < 1 doc per source and
    # never undershoots (unless the budget exceeds the total cap)
    train = recipe.filter(F.col("split") == "train")
    mixed = train.agg(
        F.sum(F.col("n_tokens") * F.col("repeat_count"))
    ).first()[0]
    cap_total = (
        train.agg(F.sum("n_tokens")).first()[0] * EPOCHS
    )
    lo = min(BUDGET, cap_total)
    max_doc = train.agg(F.max("n_tokens")).first()[0]
    n_sources = train.select("source").distinct().count()
    assert lo <= mixed <= lo + n_sources * max_doc


def test_no_component_straddles_splits(recipe):
    # leakage-safety: the split is a pure function of component id
    assert (
        recipe.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )


def test_survivors_are_unique_per_component(recipe):
    # dedup contract: exactly one representative per component
    assert (
        recipe.groupBy("component")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )


def test_quality_gate_is_integer_exact(recipe, spark):
    # every survivor satisfies the gate as stated (recompute from raw)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lower_toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    checked = recipe.join(docs.select("doc_id", "text"), "doc_id").select(
        "n_tokens",
        F.size(F.array_distinct(lower_toks)).cast("long").alias("nd"),
        F.size(lower_toks).cast("long").alias("nw"),
    )
    bad = checked.filter(
        (F.col("n_tokens") < 20)
        | (F.lit(1000) * F.col("nd") < F.lit(320) * F.col("nw"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Replayable HLL (operators/frequency.py:hll_distinct)
# ---------------------------------------------------------------------------


def test_hll_linear_branch_matches_exact_when_sparse(spark):
    # n << m: every key occupies its own register with overwhelming
    # probability; linear counting over V empties is near-exact.
    # With n=5 distinct keys the estimate must land within 1.
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_distinct,
    )

    df = spark.createDataFrame(
        [(i % 5,) for i in range(50)], "k long"
    )
    row = hll_distinct(df, "k").first()
    assert row.v_empty >= 251
    assert abs(row.approx_count - 5) <= 1


def test_hll_raw_branch_within_rsd(spark):
    # n >> 2.5m forces the raw harmonic-mean branch; classic HLL rsd
    # at m=256 is ~6.5%, so 4 rsd (26%) is a generous determinism-safe
    # bound for one fixed hash function
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_distinct,
    )

    n = 20_000
    df = spark.range(n).select(F.col("id").alias("k"))
    row = hll_distinct(df, "k").first()
    assert row.v_empty == 0 or row.approx_count > 640.0
    assert abs(row.approx_count - n) / n < 0.26


def test_hll_registers_are_mergeable(spark):
    # max-merge of two shards' registers == registers of the union —
    # the property that makes the sketch unionable across batches
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_estimate,
        hll_registers,
    )

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 5000).select(F.col("id").alias("k"))
    merged = (
        hll_registers(a, "k")
        .unionAll(hll_registers(b, "k"))
        .groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    direct = hll_registers(a.unionAll(b), "k")
    assert (
        merged.exceptAll(direct).count() == 0
        and direct.exceptAll(merged).count() == 0
    )
    est_m = hll_estimate(merged).first().approx_count
    est_d = hll_estimate(direct).first().approx_count
    assert est_m == est_d


def test_hll_null_keys_ignored(spark):
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_distinct,
    )

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "k long"
    )
    row = hll_distinct(df, "k").first()
    assert abs(row.approx_count - 2) <= 1


# ---------------------------------------------------------------------------
# Alternating-star connected components
# (operators/clustering.py:connected_components_star)
# ---------------------------------------------------------------------------


def _cc_sets(df):
    return {(r.id, r.component) for r in df.collect()}


def test_star_equivalent_to_union_find_on_random_graphs(spark):
    import random

    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(13)
    for _ in range(4):
        n = rng.randint(5, 50)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(2 * n)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert _cc_sets(connected_components_star(df)) == _cc_sets(
            connected_components(df)
        )


def test_star_solves_chain_where_label_propagation_caps(spark):
    # a 100-edge path has diameter 100: label propagation's 25-round
    # cap must now raise LOUDLY (returning half-merged components was
    # the silent-wrong-cluster failure mode), while alternating-star
    # converges in O(log n) rounds
    import pytest as _pytest

    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            df,
            driver_edge_threshold=0,
            max_iterations=25,
            fallback_star=False,
        )
    # default behavior: switch to the star algorithm instead of dying
    with _pytest.warns(RuntimeWarning, match="falling back"):
        fb = connected_components(
            df, driver_edge_threshold=0, max_iterations=25
        ).collect()
    assert len(fb) == 101 and all(r.component == 0 for r in fb)
    labels = connected_components_star(df).collect()
    assert len(labels) == 101
    assert all(r.component == 0 for r in labels)


def test_star_ignores_self_loops_and_nulls(spark):
    from music_streaming_data_pipeline_v2_spark.operators.clustering import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 3), (4, None), (5, 6)],
        "src long, dst long",
    )
    got = _cc_sets(connected_components_star(df))
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5)}


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM (operators/text.py:kn_bigram_logprob_score)
# ---------------------------------------------------------------------------


def _kn_reference(lm_rows, score_rows):
    """Driver-side reference of the exact KN arithmetic (same fixed
    operation order as kn_contrib_sql)."""
    import math
    from collections import Counter

    def toks(t):
        return [w.lower() for w in t.split()]

    lm_bi = Counter()
    lm_uni = set()
    for _, text in lm_rows:
        ws = toks(text)
        lm_uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            lm_bi[(a, b)] += 1
    cc = Counter()
    n1v = Counter()
    n1w = Counter()
    for (a, b), c in lm_bi.items():
        cc[a] += c
        n1v[a] += 1
        n1w[b] += 1
    t_types = len(lm_bi)
    n1 = sum(1 for c in lm_bi.values() if c == 1)
    n2 = sum(1 for c in lm_bi.values() if c == 2)
    v = len(lm_uni)
    d = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5

    def pc(w):
        return (n1w.get(w, 0) + 1.0) / (float(t_types) + float(v))

    out = {}
    for did, text in score_rows:
        ws = toks(text)
        if len(ws) < 2:
            continue
        s = 0
        n = 0
        for a, b in zip(ws, ws[1:]):
            if a in cc:
                p = max(lm_bi.get((a, b), 0) - d, 0.0) / cc[a] + d * n1v[
                    a
                ] / cc[a] * pc(b)
            else:
                p = pc(b)
            s += round(math.log(p) * 1e9)
            n += 1
        out[did] = (n, s / n / 1e9)
    return out


def test_kn_matches_reference_exactly(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        kn_bigram_logprob_score,
    )

    lm_rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "a cat and a dog"),
        (3, "san francisco san francisco san francisco"),
    ]
    score_rows = [
        (10, "the cat sat"),        # fluent, seen transitions
        (11, "cat the sat on"),     # scrambled, mostly unseen bigrams
        (12, "francisco the"),      # continuation-poor context word
        (13, "zzz unseen words"),   # fully OOV
    ]
    lm = spark.createDataFrame(lm_rows, "doc_id long, text string")
    sc = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in kn_bigram_logprob_score(sc, lm).collect()
    }
    want = _kn_reference(lm_rows, score_rows)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert abs(got[did][1] - want[did][1]) < 1e-12, (did, got[did], want[did])


def test_kn_fluent_beats_scrambled(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        kn_bigram_logprob_score,
    )

    lm = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
        + [(9, "the quick brown cat")],
        "doc_id long, text string",
    )
    sc = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "fox brown quick the")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.avg_logprob
        for r in kn_bigram_logprob_score(sc, lm).collect()
    }
    assert got[100] > got[101]


def test_blocklist_gate_whole_token_matching(spark):
    # whole-token, not substring: "classic" must NOT hit a "ass"-like
    # blocklist entry; counting is DISTINCT terms, not occurrences
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        blocklist_gate,
    )

    df = spark.createDataFrame(
        [
            (0, "a classic jazz record"),
            (1, "bad bad words here"),
            (2, "BAD case folding"),
            (3, "clean text only"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_blocked_terms, r.keep)
        for r in blocklist_gate(df, ["ass", "bad", "words"]).collect()
    }
    assert got[0] == (0, True)     # substring 'ass' in 'classic' ignored
    assert got[1] == (2, False)    # 'bad' counted once, 'words' once
    assert got[2] == (1, False)    # case-folded
    assert got[3] == (0, True)
    assert got[4] == (0, True)     # null text = no tokens


def test_containment_catches_subset_dup_jaccard_misses(spark):
    # a 5-token doc fully embedded in a 50-token doc: containment 1.0
    # A->B, while Jaccard = 5/50 = 0.1 would never flag it
    from music_streaming_data_pipeline_v2_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i}" for i in range(45))
    df = spark.createDataFrame(
        [(1, "en", small), (2, "en", big), (3, "en", "totally other words")],
        "doc_id long, lang string, text string",
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(
            df, "lang", threshold_permille=900
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (2, 1) not in got  # asymmetric: big is NOT contained in small
    assert not {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(df, "lang", threshold=0.5).collect()
    }


def test_containment_prefix_equals_naive_fuzz(spark):
    # losslessness of the one-sided prefix filter vs the naive
    # quadratic join over random corpora (the oracle proves this on
    # the documents table; here over adversarial small vocabularies)
    import itertools
    import random

    from music_streaming_data_pipeline_v2_spark.operators.dedup import (
        containment_pairs,
    )

    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(12)]
    for trial, tp in [(0, 500), (1, 700), (2, 1000)]:
        docs = []
        for did in range(14):
            k = rng.randint(1, 8)
            docs.append((did, "en", " ".join(rng.sample(vocab, k))))
        df = spark.createDataFrame(
            docs, "doc_id long, lang string, text string"
        )
        got = {
            (r.id_a, r.id_b)
            for r in containment_pairs(
                df, "lang", threshold_permille=tp
            ).collect()
        }
        toks = {d: set(t.split()) for d, _, t in docs}
        want = {
            (a, b)
            for a, b in itertools.permutations(toks, 2)
            if 1000 * len(toks[a] & toks[b]) >= tp * len(toks[a])
        }
        assert got == want, (trial, tp, got ^ want)


# ---------------------------------------------------------------------------
# BPE tokenizer induction (operators/bpe.py). The hash-exact DuckDB
# replay lives in the registry (bpe_merge_steps / bpe_token_lengths);
# these pin semantics the oracle hash can't state directly.
# ---------------------------------------------------------------------------


def _bpe_corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


def test_bpe_hand_checkable_merges(spark):
    """'low lower lowest low' × canonical hand-trace: the most
    frequent pair merges first and later steps build on merged
    symbols."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
    )

    corpus = _bpe_corpus(spark, ["low low low lower", "lowest low lower"])
    merges, words = bpe_merges(corpus, k=3)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in merges.orderBy("step").collect()
    ]
    # 6 'low'-prefixed words: (l,o) and (o,w) both appear 7× — tie
    # breaks lexicographically to (l,o); then (lo,w) 7×; then 'low'
    # is one symbol in every word and (low, e) appears in lower×2 +
    # lowest = 3 vs everything else ≤ 3 — (low,e) wins ties by lhs.
    assert got[0] == (1, "l", "o", 7)
    assert got[1] == (2, "lo", "w", 7)
    assert got[2] == (3, "low", "e", 3)
    seg = {
        r["word"]: r["s"] for r in words.collect()
    }
    assert seg["low"] == "\x1elow\x1f"
    assert seg["lower"] == "\x1elowe\x1f\x1er\x1f"


def test_bpe_same_symbol_run_is_leftmost_greedy(spark):
    """'aaaa' under merge (a,a): leftmost non-overlapping → aa|aa;
    'aaaaa' → aa|aa|a (canonical BPE run behavior, the case plain
    space-delimited string replace gets wrong)."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
    )

    corpus = _bpe_corpus(spark, ["aaaa aaaaa"])
    merges, words = bpe_merges(corpus, k=1)
    m = merges.collect()[0]
    # pairs: aaaa has 3 (a,a), aaaaa has 4 → 7
    assert (m["lhs"], m["rhs"], m["pair_count"]) == ("a", "a", 7)
    seg = {r["word"]: r["s"] for r in words.collect()}
    assert seg["aaaa"] == "\x1eaa\x1f\x1eaa\x1f"
    assert seg["aaaaa"] == "\x1eaa\x1f\x1eaa\x1f\x1ea\x1f"


def test_bpe_no_false_boundary_matches(spark):
    """Merging (a,b) must not fire inside longer symbols: after
    (a,b)→ab exists as a symbol, a later (ab,c) merge only matches
    the whole symbols, never a char run inside an unrelated word."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
    )

    # 'xabc' contains chars a,b,c but after step1 merges the corpus
    # majority pair, step2's pattern must anchor on symbol boundaries.
    corpus = _bpe_corpus(
        spark, ["ab ab ab ab abc abc", "xabc ab abc"]
    )
    merges, words = bpe_merges(corpus, k=2)
    got = [(r["lhs"], r["rhs"]) for r in merges.orderBy("step").collect()]
    assert got[0] == ("a", "b")
    seg = {r["word"]: r["s"] for r in words.collect()}
    # xabc: x + merged(ab) + c under step1; step2 (ab,c) merges abc
    assert "\x1eab\x1f" in seg["ab"]
    if got[1] == ("ab", "c"):
        assert seg["abc"] == "\x1eabc\x1f"
        assert seg["xabc"] == "\x1ex\x1f\x1eabc\x1f"


def test_bpe_encode_lengths_sum_invariants(spark):
    """n_bpe_tokens is bounded by chars (no merges possible) below and
    n_words above (every word ≥1 token), and merging monotonically
    shrinks total tokens as k grows."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_encode_lengths,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    totals = {}
    for k in (0, 3):
        enc = bpe_encode_lengths(docs, k=k)
        agg = enc.agg(
            F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
        ).collect()[0]
        totals[k] = (agg["w"], agg["t"])
    assert totals[0][0] == totals[3][0]  # word count independent of k
    assert totals[0][1] > totals[3][1]   # k=0 tokens = chars > merged
    assert totals[3][1] >= totals[3][0]  # every word ≥ 1 token


def test_wordpiece_diverges_from_bpe_on_likelihood(spark):
    """(q,u): rare but perfectly co-occurring → wordpiece's first
    merge; (e,r): more frequent but diluted by standalone e/r → BPE's
    first merge. Scores: 3/(3·3)=0.33 vs 5/(15·15)=0.022."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
        wordpiece_merges,
    )

    corpus = _bpe_corpus(
        spark,
        ["qu qu qu er er er er er", "e e e e e e e e e e r r r r r r r r r r"],
    )
    wp = wordpiece_merges(corpus, k=1)[0].collect()[0]
    bp = bpe_merges(corpus, k=1)[0].collect()[0]
    assert (wp["lhs"], wp["rhs"], wp["pair_count"]) == ("q", "u", 3)
    assert (bp["lhs"], bp["rhs"], bp["pair_count"]) == ("e", "r", 5)


def test_bpe_cross_corpus_encode_unseen_word_fallback(spark):
    """Encoding a corpus with a tokenizer trained elsewhere: unseen
    words fall back to char count; seen words use trained lengths."""
    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_encode_lengths,
        bpe_merges,
    )

    train = _bpe_corpus(spark, ["ab ab ab ab"])
    trained = bpe_merges(train, k=1)[1]  # 'ab' is one symbol now
    serve = _bpe_corpus(spark, ["ab zzz"])
    row = bpe_encode_lengths(serve, trained_words=trained).collect()[0]
    # 'ab' → 1 trained token; 'zzz' unseen → 3 chars
    assert (row["n_words"], row["n_bpe_tokens"]) == (2, 4)


def test_bpe_matches_pure_python_reference_fuzz(spark):
    """Property: bpe_merges ≡ an INDEPENDENT pure-Python greedy BPE
    (dict-of-tuples trainer, no string-encoding tricks) on seeded
    random corpora — kills any shared-design bug between the Spark
    implementation and its DuckDB oracle, which replay the same
    wrapped-string algorithm."""
    import random

    from music_streaming_data_pipeline_v2_spark.operators.bpe import (
        bpe_merges,
    )

    def ref_bpe(words, k):
        # vocab: word -> (freq, symbol tuple)
        vocab = {}
        for w in words:
            f, syms = vocab.get(w, (0, tuple(w)))
            vocab[w] = (f + 1, syms)
        merges = []
        for _ in range(k):
            pc = {}
            for f, syms in vocab.values():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + f
            if not pc:
                break
            # total order: count desc, lhs asc, rhs asc
            items = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            (lhs, rhs), cnt = items[0]
            merges.append((lhs, rhs, cnt))
            new_vocab = {}
            for w, (f, syms) in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == lhs
                        and syms[i + 1] == rhs
                    ):
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[w] = (f, tuple(out))
            vocab = new_vocab
        return merges

    rng = random.Random(406)
    for trial in range(4):
        n_docs = rng.randint(2, 6)
        docs, all_words = [], []
        for _ in range(n_docs):
            n_words = rng.randint(1, 12)
            ws = [
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(1, 6))
                )
                for _ in range(n_words)
            ]
            all_words.extend(ws)
            docs.append(" ".join(ws))
        k = rng.randint(1, 5)
        expected = ref_bpe(all_words, k)
        got = [
            (r["lhs"], r["rhs"], r["pair_count"])
            for r in bpe_merges(_bpe_corpus(spark, docs), k=k)[0]
            .orderBy("step")
            .collect()
        ]
        assert got == expected, (trial, docs, k, got, expected)


def test_score_percentiles_semantics(spark):
    """Ties share the competition-rank percentile, the strict max gets
    1000, the min gets 0, and single-row groups get 0."""
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        score_percentiles,
    )

    rows = [
        (1, "a", 10),
        (2, "a", 10),
        (3, "a", 20),
        (4, "a", 30),
        (5, "a", 40),  # n=5: ranks 1,1,3,4,5 -> 0,0,500,750,1000
        (6, "b", 99),  # singleton group -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    got = {
        r["doc_id"]: r["pctl_permille"]
        for r in score_percentiles(df, "score").collect()
    }
    assert got == {1: 0, 2: 0, 3: 500, 4: 750, 5: 1000, 6: 0}


# ---------------------------------------------------------------------------
# chi2_keyness — invariants beyond the oracle hash
# ---------------------------------------------------------------------------


def test_chi2_keyness_only_overrepresented_and_ordered(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        chi2_keyness,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = chi2_keyness(docs, group_col="lang", k=10, min_count=5).collect()
    assert out, "keyness produced no rows"
    by_group: dict = {}
    for r in out:
        assert r["n_in_group"] >= 5
        assert r["chi2_milli"] >= 0
        by_group.setdefault(r["lang"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        # ordering: chi2 non-increasing with rank
        vals = [r["chi2_milli"] for r in rows]
        assert vals == sorted(vals, reverse=True)


def test_chi2_keyness_exclusive_token_tops_its_group(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        chi2_keyness,
    )

    rows = []
    for i in range(20):
        rows.append((i, "A", "zebra common filler words here"))
        rows.append((100 + i, "B", "common filler words here also"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = chi2_keyness(docs, group_col="lang", k=3, min_count=5)
    top_a = out.filter("lang = 'A' AND rk = 1").first()
    assert top_a["token"] == "zebra"  # exclusive to A => most distinctive


# ---------------------------------------------------------------------------
# SQ8 scalar quantization
# ---------------------------------------------------------------------------


def test_sq8_grid_endpoints_and_degenerate_dim(spark):
    from music_streaming_data_pipeline_v2_spark.operators.similarity import (
        sq_encode,
        sq_params,
    )

    # dim0 spans [0, 1]; dim1 is constant (degenerate step=0)
    data = [
        (0, [0.0, 7.0]),
        (1, [0.5, 7.0]),
        (2, [1.0, 7.0]),
    ]
    emb = spark.createDataFrame(
        data, "vec_id long, embedding array<float>"
    )
    mins, maxs, steps = sq_params(emb, dims=2)
    assert mins[0] == 0.0 and maxs[0] == 1.0
    assert steps[1] == 0.0
    codes = {
        r["id"]: r["sq_code"].split(",")
        for r in sq_encode(emb, mins, steps).collect()
    }
    assert codes[0][0] == "0"  # min of the grid
    assert codes[2][0] == "255"  # max clamps to the top cell
    assert 0 <= int(codes[1][0]) <= 255
    assert {c[1] for c in codes.values()} == {"0"}  # degenerate dim -> 0


def test_sq8_recall_is_high_at_8_bits(spark):
    from music_streaming_data_pipeline_v2_spark.operators.similarity import (
        l2_topk,
        sq_params,
        sq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mins, _maxs, steps = sq_params(emb, dims=64)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sq_topk(emb, queries, mins, steps, k=10)
    exact = l2_topk(emb, queries, k=10, dims=64)
    hits = exact.join(
        approx.select("query_id", "doc_id"),
        ["query_id", "doc_id"],
        "left_semi",
    ).count()
    total = exact.count()
    assert total == 50
    # 8-bit per-dim symmetric quantization on 64 dims is near-exact
    assert hits / total >= 0.9, f"recall {hits}/{total}"


# ---------------------------------------------------------------------------
# group_minhash_overlap (default xxhash family; md5 family is pinned
# by the source_overlap_minhash oracle row)
# ---------------------------------------------------------------------------


def test_group_overlap_identical_and_disjoint(spark):
    from music_streaming_data_pipeline_v2_spark.operators.dedup import (
        group_minhash_overlap,
    )

    rows = []
    for i in range(30):
        t_a = f"alpha beta gamma delta epsilon token{i} zeta eta"
        rows.append((i, "g1", t_a))
        rows.append((1000 + i, "g2", t_a))  # g2 == g1 exactly
        rows.append(
            (2000 + i, "g3", f"uno dos tres cuatro cinco w{i} seis siete")
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        (r["g_a"], r["g_b"]): r
        for r in group_minhash_overlap(docs, group_col="source").collect()
    }
    same = out[("g1", "g2")]
    assert same["exact_permille"] == 1000
    assert same["est_matches"] == 8 and same["est_permille"] == 1000
    disj = out[("g1", "g3")]
    assert disj["n_common"] == 0 and disj["exact_permille"] == 0
    assert disj["est_matches"] == 0  # 64-bit hashes: collisions ~0


# ---------------------------------------------------------------------------
# ks_drift — textbook endpoints the oracle hash can't state
# ---------------------------------------------------------------------------


def test_ks_drift_identical_and_disjoint(spark):
    from music_streaming_data_pipeline_v2_spark.operators.drift import (
        ks_drift,
    )

    same = [("a", v) for v in range(10)] + [("b", v) for v in range(10)]
    df = spark.createDataFrame(same, "g string, v long")
    out = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert out["a"]["ks_permille"] == 0  # identical distributions
    assert out["a"]["ks_num"] == 0

    disj = [("a", v) for v in range(10)] + [("b", 100 + v) for v in range(10)]
    df2 = spark.createDataFrame(disj, "g string, v long")
    out2 = {r["g"]: r for r in ks_drift(df2, "g", "v").collect()}
    assert out2["a"]["ks_permille"] == 1000  # disjoint supports => KS=1
    assert out2["b"]["ks_permille"] == 1000
    assert out2["a"]["n_g"] == 10 and out2["a"]["n_rest"] == 10


def test_ngram_novelty_endpoints(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        ngram_novelty,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [
            (10, "a b c d e f g"),  # verbatim copy -> novelty 0
            (11, "x y z w v u t"),  # fully new -> novelty 1000
            (12, "a b c d e z z"),  # mixed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in ngram_novelty(train, test, n=5).collect()
    }
    assert out[10]["novelty_permille"] == 0
    assert out[10]["n_seen"] == out[10]["n_grams"] == 3
    assert out[11]["novelty_permille"] == 1000 and out[11]["n_seen"] == 0
    assert out[12]["n_grams"] == 3 and out[12]["n_seen"] == 1
    assert out[12]["novelty_permille"] == 666


def test_embedding_outlier_gate_drops_far_tail(spark):
    from music_streaming_data_pipeline_v2_spark.operators.similarity import (
        embedding_outlier_gate,
    )

    # one tight cluster at the origin-ish corner, one planted outlier
    rows = [(i, [0.01 * i] + [0.0] * 63) for i in range(20)]
    rows.append((99, [50.0] + [0.0] * 63))  # far outlier, same cell
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.0] * 64]
    out = {
        r["vec_id"]: r
        for r in embedding_outlier_gate(
            emb, cents, keep_permille=900
        ).collect()
    }
    assert out[99]["pctl_permille"] == 1000 and not out[99]["keep"]
    assert out[0]["pctl_permille"] == 0 and out[0]["keep"]
    kept = sum(1 for r in out.values() if r["keep"])
    assert kept < len(out)  # the gate actually bites


def test_hll_group_overlap_union_algebra(spark):
    from music_streaming_data_pipeline_v2_spark.operators.frequency import (
        hll_group_overlap,
    )

    rows = []
    for i in range(200):
        rows.append(("g1", f"tok{i}"))         # g1: tok0..199
        rows.append(("g2", f"tok{i}"))         # g2 identical to g1
        rows.append(("g3", f"other{i}"))       # g3 disjoint
    df = spark.createDataFrame(rows, "source string, token string")
    out = {
        (r["g_a"], r["g_b"]): r
        for r in hll_group_overlap(df, "source", "token").collect()
    }
    same = out[("g1", "g2")]
    # identical sets: union sketch == each member's sketch exactly
    assert same["est_union"] == same["est_a"] == same["est_b"]
    assert abs(same["est_intersection"] - same["est_a"]) < 1e-6
    disj = out[("g1", "g3")]
    # union of disjoint sets: sketch-union >= each side, intersection
    # estimate small relative to either set (HLL error band)
    assert disj["est_union"] >= max(disj["est_a"], disj["est_b"])
    assert abs(disj["est_intersection"]) < 0.5 * min(
        disj["est_a"], disj["est_b"]
    )


def test_tfidf_cosine_pairs_semantics(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "x", "apple banana cherry"),
            (2, "x", "apple banana cherry"),   # identical to 1 -> cos 1
            (3, "x", "dog elephant fox"),      # disjoint from 1/2
            (4, "y", "apple banana cherry"),   # same text, other block
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in tfidf_cosine_pairs(
            docs, threshold_permille=0, max_df=64
        ).collect()
    }
    assert abs(out[(1, 2)]["cos_sim"] - 1.0) < 1e-12  # identical vectors
    assert (1, 3) not in out  # no shared term -> no candidate at all
    assert (1, 4) not in out and (2, 4) not in out  # cross-block blocked


def test_tfidf_cosine_df_cap_drops_stopwords_consistently(spark):
    from music_streaming_data_pipeline_v2_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    # 'the' appears in every doc; with max_df=2 it leaves the
    # vocabulary entirely, so docs sharing ONLY 'the' form no pair
    docs = spark.createDataFrame(
        [
            (1, "x", "the apple pie"),
            (2, "x", "the apple tart"),
            (3, "x", "the zebra"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        (r["id_a"], r["id_b"])
        for r in tfidf_cosine_pairs(
            docs, threshold_permille=0, max_df=2
        ).collect()
    }
    assert (1, 2) in out      # still share 'apple' (df=2)
    assert (1, 3) not in out  # only 'the' (df=3 > cap) in common


def test_session_attribution_first_touch_semantics(spark):
    from music_streaming_data_pipeline_v2_spark.operators.funnel import (
        session_attribution,
    )

    # user 1: [view, click, purchase(5)] in one session, then a >30min
    # gap, then [click, purchase(7)] — purchases attribute to view and
    # click respectively; user 2: [purchase(9)] alone -> self-attributed
    rows = [
        (1, 1, 1000, "view", 0.0),
        (2, 1, 1060, "click", 0.0),
        (3, 1, 1120, "purchase", 5.0),
        (4, 1, 1120 + 1801, "click", 0.0),
        (5, 1, 1120 + 1862, "purchase", 7.0),
        (6, 2, 1000, "purchase", 9.0),
    ]
    events = spark.createDataFrame(
        [(eid, uid, ts, et, v) for eid, uid, ts, et, v in rows],
        "event_id long, user_id long, _ts long, event_type string, value double",
    ).selectExpr(
        "event_id", "user_id",
        "CAST(timestamp_seconds(_ts) AS TIMESTAMP) AS ts",
        "event_type", "value",
    )
    out = {
        r["first_type"]: r
        for r in session_attribution(events, gap_minutes=30).collect()
    }
    assert out["view"]["n_targets"] == 1 and out["view"]["target_value"] == 5.0
    assert out["click"]["n_targets"] == 1 and out["click"]["target_value"] == 7.0
    assert out["purchase"]["n_sessions"] == 1
    assert out["purchase"]["target_value"] == 9.0
    assert out["view"]["n_sessions"] == 1 and out["click"]["n_sessions"] == 1


def test_key_skew_audit_statistics(spark):
    from music_streaming_data_pipeline_v2_spark.operators.skew import (
        key_skew_audit,
    )

    # key 'hot' holds 80 of 100 rows over 21 keys
    rows = [(i, "hot") for i in range(80)]
    rows += [(100 + i, f"k{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, k string")
    out = {r["k"]: r for r in key_skew_audit(df, "k", k=3).collect()}
    hot = out["hot"]
    assert hot["rank"] == 1
    assert hot["share_permille"] == 800          # 80/100
    assert hot["skew_permille"] == 800 * 21      # 80 / (100/21) fair shares
    assert all(r["n_rows"] == 1 for k, r in out.items() if k != "hot")


def test_eb_shrunk_rates_pull_small_sources_to_prior(spark):
    from music_streaming_data_pipeline_v2_spark.operators.quality import (
        eb_shrunk_rates,
    )

    # big: 1000 rows, 100 bad (10%); small: 10 rows, 5 bad (50%)
    rows = [(i, "big", i < 100) for i in range(1000)]
    rows += [(10_000 + i, "small", i < 5) for i in range(10)]
    df = spark.createDataFrame(rows, "rid long, source string, bad boolean")
    out = {
        r["source"]: r
        for r in eb_shrunk_rates(
            df, "source", "bad", prior_strength=50
        ).collect()
    }
    big, small = out["big"], out["small"]
    assert big["raw_permille"] == 100
    assert small["raw_permille"] == 500
    # global rate = 105/1010 ≈ 104‰; shrinkage moves each toward it,
    # small much harder than big
    assert abs(big["shrunk_permille"] - big["raw_permille"]) <= 1
    assert small["shrunk_permille"] < 200  # 50 phantom docs dominate 10
    # exact expected values: big (100*1010+50*105)//(1050*1010)*1000
    assert big["shrunk_permille"] == (
        1000 * (100 * 1010 + 50 * 105) // ((1000 + 50) * 1010)
    )
    assert small["shrunk_permille"] == (
        1000 * (5 * 1010 + 50 * 105) // ((10 + 50) * 1010)
    )


def test_chi2_keyness_matches_independent_python_reference(spark):
    # the oracle proves Spark ≡ DuckDB, but both interpolate the SAME
    # chi2_milli_sql string — a shared-design bug (wrong formula) would
    # hash-match. This fuzz recomputes chi-square per surviving term
    # with an independent pure-Python contingency implementation.
    import random

    from music_streaming_data_pipeline_v2_spark.operators.text import (
        chi2_keyness,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for did in range(120):
        g = rng.choice(["A", "B", "C"])
        bias = {"A": vocab[:6], "B": vocab[3:9], "C": vocab[6:]}[g]
        toks = [rng.choice(bias if rng.random() < 0.7 else vocab)
                for _ in range(rng.randint(3, 12))]
        rows.append((did, g, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = chi2_keyness(docs, group_col="lang", k=12, min_count=5).collect()
    assert out

    # independent reference: counts from the same rows, formula from
    # first principles (N * (ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)))
    from collections import Counter

    cnt: Counter = Counter()
    for _, g, text in rows:
        for t in text.lower().split():
            cnt[(g, t)] += 1
    tok_tot = Counter()
    grp_tot = Counter()
    for (g, t), c in cnt.items():
        tok_tot[t] += c
        grp_tot[g] += c
    n = sum(cnt.values())
    for r in out:
        a = cnt[(r["lang"], r["token"])]
        b = tok_tot[r["token"]] - a
        c = grp_tot[r["lang"]] - a
        d = n - a - b - c
        assert a == r["n_in_group"]
        assert float(a) * n > float(a + b) * (a + c)  # overrepresented
        chi2 = (
            float(n) * (float(a) * d - float(b) * c) ** 2
            / (float(a + b) * (c + d) * (a + c) * (b + d))
        )
        # the engine reports round(chi2 * 1000); allow 1 milli of
        # FP-association slack between the reference and the engine
        assert abs(r["chi2_milli"] - round(chi2 * 1000)) <= 1
