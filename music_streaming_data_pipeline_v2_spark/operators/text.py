"""Text-analysis operators for training-data pipelines.

Beyond the reference surface (north-star extension, SURVEY.md §7 phase
6): language-ID, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` relation.

All hot-path logic is built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, zero Python. At 100 TB these are embarrassingly
parallel map-only transforms: no shuffle, pure scan→project, so they
scale linearly with executors and stay inside one codegen stage
(verify: ``.explain`` shows a single WholeStageCodegen span over the
scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import ENGINE_SAFE_WS

# Tiny per-language stopword marker lists for the n-gram/stopword
# language heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization: split on runs of whitespace, dropping
    empty strings (leading/trailing whitespace artifacts)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def bpe_ish_tokens(col: str | Column = "text") -> Column:
    """BPE-ish sub-word segmentation: word pieces, numbers, and
    punctuation runs as separate tokens (a GPT-2-style pre-tokenizer
    regex, simplified to what Java regex supports)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)"), 1),
        lambda t: t != F.lit(""),
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish subword tokens."""
    return df.withColumn("n_tokens_ws", F.size(tokens(text_col))).withColumn(
        "n_tokens_bpe", F.size(bpe_ish_tokens(text_col))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length / punctuation / stopword / repetition
    ratios — the standard cheap pre-filter features for LLM corpora
    (C4/Gopher-style rules, built-ins only)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_chars = F.length(t)
    n_toks = F.size(toks)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_toks)
        .withColumn(
            "mean_token_len",
            F.when(n_toks > 0, (F.length(F.concat_ws("", toks)) / n_toks)),
        )
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / F.greatest(
                n_chars, F.lit(1)
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.size(F.filter(toks, lambda x: F.array_contains(stop, F.lower(x))))
            / F.greatest(n_toks, F.lit(1)),
        )
        .withColumn(
            "unique_token_ratio",
            F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1] from the features: documents that
    are too short, punctuation-heavy, or highly repetitive score low."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
        + F.col("unique_token_ratio") * 0.4
    )
    return feats.withColumn("quality_score", score)


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score each candidate language by its
    marker-word hit ratio; pick the argmax (ties → lexicographic lang
    code). Pure built-ins: one map stage, no UDF, no shuffle."""
    toks_lower = F.transform(tokens(text_col), F.lower)
    scores = []
    for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items())):
        marker_arr = F.array([F.lit(w) for w in markers])
        hit = F.size(F.filter(toks_lower, lambda x: F.array_contains(marker_arr, x)))
        scores.append(
            F.struct(
                (hit / F.greatest(F.size(toks_lower), F.lit(1))).alias("score"),
                # ties pick the alphabetically-first language: larger -i wins
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    detected = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn("detected_lang", detected)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: MD5 over whitespace-normalized,
    lowercased text — a deterministic content hash for exact-dup
    detection and lineage; plus a 64-bit xxhash for cheap joins.
    Uses functions/scalar.py:normalize_text — the ONE canonical
    normalization both fingerprinting and exact dedup share."""
    from ..functions.scalar import normalize_text

    norm = normalize_text(text_col)
    return df.withColumn("fingerprint_md5", F.md5(norm)).withColumn(
        "fingerprint_x64", F.xxhash64(norm)
    )

def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Three-relation composition, all built-in: per-(doc, token) term
    frequency; per-token document frequency (an aggregate OF the first
    aggregate, so the corpus is tokenized once); the corpus size as a
    broadcast 1-row scalar. ``tfidf = tf * ln(n_docs / doc_freq)``.

    Ranking is by the TF-IDF score itself, made engine-portable by an
    integer-exact proxy: ``tf * round(ln(n_docs/doc_freq) * 1e6)`` as a
    BIGINT (ties broken by token ASC). Ordering directly by the raw
    double could flip near-equal pairs across engines' ``ln``
    implementations; the scaled-and-rounded integer is stable while
    preserving the true tf·idf ordering to 6 decimal places of idf.
    The double score is also emitted (rounded) as a value column.

    Scale: two token-keyed shuffles; the document-frequency side is
    vocabulary-sized (≪ corpus) so AQE broadcasts it when it fits, and
    hot stop-tokens are 1:1 probes into it, not expanding joins.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                6,
            ),
        )
        .withColumn(
            "tfidf_i",
            F.col("tf")
            * F.round(
                F.log(F.col("n_docs").cast("double") / F.col("doc_freq")) * 1e6
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf_i"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "doc_freq", "tfidf", "rank")
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
) -> DataFrame:
    """Token → posting-list inverted index.

    One row per distinct token: document frequency, total term
    frequency, and the first ``max_postings`` doc ids (sorted) as a
    comma-joined preview string — the build side of any keyword-search
    or doc-frequency service over the corpus.

    Plan shape: explode → per-(token, doc) count (map-side partial agg
    collapses the repeats) → per-token agg with ``collect_set``. One
    token-keyed shuffle; posting lists are capped so a stop-token's
    entry stays bounded (the df/tf counts remain exact — only the
    preview list is truncated). At real scale the full postings would
    go to a token-bucketed table instead of a string column.
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    per_doc = tok.groupBy("token", "_id").agg(F.count("*").alias("_tf"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("_tf").alias("term_freq"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("_id")), 1, max_postings), ","
            ).alias("postings_preview"),
        )
    )


def redact_terms(
    df: DataFrame,
    deny_terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Denylist scrub — the PII-redaction plumbing with a term
    denylist standing in for PII regexes (emails/phones/SSNs drop in
    as alternative patterns; the testdata corpus is synthetic word
    salad, so the denylist form keeps the operator oracle-checkable).

    Adds ``text_redacted`` (every whole-word denylist hit replaced by
    ``[REDACTED]``) and ``n_redactions``. Map-only, JVM regex, no
    shuffle — at 100 TB this is a pure scan→project pass.

    Terms are treated as LITERALS (quoted with ``\\Q…\\E``): an
    unescaped 'c++' or 'a.b' would crash or silently match the wrong
    text. An empty denylist is a no-op — the naive empty alternation
    ``\\b()\\b`` matches every word boundary and shreds the corpus.
    """
    t = F.col(text_col)
    terms = [x for x in deny_terms if x]
    if not terms:
        return df.withColumn("text_redacted", t).withColumn(
            "n_redactions", F.lit(0).cast("bigint")
        )
    # lookaround boundaries, not \b: a term edged with non-word chars
    # ('c++') has no word boundary at its edge, so \b would never
    # match it; (?<!\w)…(?!\w) is equivalent for word-edged terms and
    # correct for all literals
    pattern = (
        r"(?<!\w)(" + "|".join(rf"\Q{x}\E" for x in terms) + r")(?!\w)"
    )
    return df.withColumn(
        "text_redacted", F.regexp_replace(t, pattern, "[REDACTED]")
    ).withColumn(
        "n_redactions",
        (F.size(F.regexp_extract_all(t, F.lit(pattern), 1))).cast("bigint"),
    )


def word_ngrams(col: str | Column, n: int) -> Column:
    """Distinct word n-grams using the engine-portable whitespace class
    (see operators/packing.py:engine_safe_tokens for why not ``\\s``)."""
    c = F.col(col) if isinstance(col, str) else col
    w = F.filter(F.split(F.trim(c), ENGINE_SAFE_WS), lambda t: t != F.lit(""))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.when(F.size(w) >= n, grams).otherwise(empty))


def word_ngram_rows(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_id: str = "doc_id",
) -> DataFrame:
    """Non-distinct (doc, n-gram) occurrence rows via posexplode + lead
    windows — the ONE gram builder every occurrence-aware consumer
    shares (word_ngram_postings adds distinct();
    quality.py:gopher_repetition counts the multiset).

    ~4× faster measured than exploding ``word_ngrams``: the
    higher-order ``transform(slice(...))`` form is interpreted per gram
    (HOFs don't whole-stage-codegen), while posexplode + ``lead``
    chains stay inside codegen at the cost of one doc-keyed window
    shuffle of short token rows — the right trade whenever CPU, not
    shuffle, dominates (it does: the shuffle rows are tokens, the HOF
    cost is per gram × per token)."""
    from pyspark.sql import Window

    # plain split + post-explode row filter: the higher-order
    # F.filter(lambda) array form is interpreted; filtering exploded
    # ROWS stays in codegen. lead() orders by _pos, not indexes it, so
    # dropping an empty token (only possible for empty input text)
    # still yields grams over consecutive surviving tokens.
    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w = Window.partitionBy("_id").orderBy("_pos")
    base = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_t")
    ).filter(F.col("_t") != "")
    gram = F.concat_ws(
        " ", F.col("_t"), *[F.lead("_t", i).over(w) for i in range(1, n)]
    )
    # gram and the completeness probe MUST be computed in the same
    # projection: a filter between two window projections would make
    # the later leads run over the already-filtered rows (dropping the
    # tail tokens grams need), not the full token sequence.
    return (
        base.select(
            F.col("_id").alias(out_id),
            gram.alias("gram"),
            F.lead("_t", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select(out_id, "gram")
    )


def word_multi_ngram_rows(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_id: str = "doc_id",
) -> DataFrame:
    """``(id, _ord, gram)`` occurrence rows for EVERY order 1..n in ONE
    tokenize + posexplode + window pass — the multi-order sibling of
    ``word_ngram_rows`` for consumers that need several gram orders of
    the same text (BLEU-style clipped precision needs 1-grams and
    2-grams of both pair sides; four single-order builder calls paid
    four tokenize+window passes for what one pass provides). Per
    order ``o``, gram = the o leads concatenated and the row is valid
    iff ``lead(o-1)`` exists — exactly ``word_ngram_rows(o)``'s gram
    set, emitted from shared lead columns via one explode."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w = Window.partitionBy("_id").orderBy("_pos")
    base = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_t")
    ).filter(F.col("_t") != "")
    # all leads in one window projection (the same single-projection
    # rule as word_ngram_rows: a filter between window projections
    # would change what the later leads see)
    proj = base.select(
        "_id",
        "_t",
        *[F.lead("_t", i).over(w).alias(f"_l{i}") for i in range(1, n)],
    )
    entries = []
    for o in range(1, n + 1):
        parts = [F.col("_t")] + [F.col(f"_l{i}") for i in range(1, o)]
        gram_o = parts[0] if o == 1 else F.concat_ws(" ", *parts)
        ok = F.lit(True) if o == 1 else F.col(f"_l{o - 1}").isNotNull()
        entries.append(
            F.struct(
                F.lit(o).alias("_ord"), gram_o.alias("gram"), ok.alias("_ok")
            )
        )
    return (
        proj.select("_id", F.explode(F.array(*entries)).alias("_e"))
        .filter(F.col("_e._ok"))
        .select(
            F.col("_id").alias(out_id),
            F.col("_e._ord").alias("_ord"),
            F.col("_e.gram").alias("gram"),
        )
    )


def word_ngram_postings(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_id: str = "doc_id",
) -> DataFrame:
    """Distinct (doc, n-gram) postings — ``word_ngram_rows`` deduped."""
    return word_ngram_rows(
        df, n, text_col=text_col, id_col=id_col, out_id=out_id
    ).distinct()


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = None,
) -> DataFrame:
    """GPT-3-style n-gram decontamination check: for each test document,
    how many of its distinct word n-grams appear in ANY training
    document, and how many training documents share at least one.

    Shape: explode both sides to distinct (doc, gram) postings and
    equi-join on the gram — the shuffle is gram-keyed, never doc×doc.
    The standard n=13 makes collisions essentially impossible by
    chance, so every hit is real leakage. A boilerplate gram shared by
    millions of training docs would still fan out; ``max_gram_df``
    caps the training-side document frequency (drop grams with df >
    cap) — like the LSH ``max_bucket``, a recall-for-bound trade that
    should be REPORTED when used, so it is off (exact) by default.

    Returns (doc_id, n_shared_grams, n_train_docs_hit) for
    contaminated test docs only; clean docs are absent (left-join and
    coalesce at the call site if a full roster is needed).

    (An identical-gram-set contraction of the training side — the
    dedup-before-join trick dedup_clusters_exact uses — was tried and
    MEASURED 4× slower here: n=13 gram sets are almost all distinct,
    so the collapse is negligible while the extra self-join and
    join-back aggregations are not. If the training corpus is known
    duplicate-heavy, exact-dedup it first; this operator stays the
    simple postings join.)
    """
    tg = word_ngram_postings(train, n, text_col, id_col, out_id="train_id")
    if max_gram_df is not None:
        small = (
            tg.groupBy("gram")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .select("gram")
        )
        tg = tg.join(small, "gram")
    sg = word_ngram_postings(test, n, text_col, id_col)
    return (
        sg.join(tg, "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("train_id").alias("n_train_docs_hit"),
        )
    )


#: take the Bloom path under strategy='auto' only past this much
#: training input (Catalyst size estimate, bytes): below it the filter
#: build dominates the shuffle it saves (measured at sf0.1: bloom
#: 1.9 s vs plain 0.97 s — the build is ~1 s of fixed cost, while the
#: avoided train-posting shuffle is pennies at toy scale).
_BLOOM_MIN_TRAIN_BYTES = 1 << 30


def ngram_contamination_bloom(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
    strategy: str = "auto",
) -> DataFrame:
    """``ngram_contamination`` with a broadcast Bloom prefilter on the
    training side — identical results, different physical plan.

    The exact operator shuffles EVERY distinct training (doc, gram)
    posting to the gram-keyed join; at 100 TB that's the whole corpus'
    gram inventory moving for a test set whose grams number in the
    millions. Here the test grams (the small side by contract — a
    held-out eval set) build a Bloom filter (bloom.py:bloom_prefilter:
    one pass over test grams, m sized for ``fpp``), and the TRAIN
    posting scan drops non-candidate grams map-side before the
    shuffle: expected surviving volume = true hits + fpp × corpus
    grams — a ≥ ~99% shuffle cut at the default 1%.

    Correctness is not approximate: Bloom filters have no false
    negatives, every surviving candidate still goes through the SAME
    exact gram equi-join, so the output is row-for-row identical to
    ``ngram_contamination`` — the equivalence `bloom_decontamination`'s
    oracle hash-checks against the plain exact SQL (the same
    accelerator-equivalence pattern as ``salted_agg_equivalence``).

    Cost note: building the filter adds one job over the test side
    (count_distinct + build); worth it exactly when the training side
    dwarfs the test side. ``strategy='auto'`` (default) makes that
    call mechanically — the same cost-probe pattern as jaccard_pairs
    and dedup_clusters_auto: the train side's Catalyst size estimate
    (free, plan statistics — the parquet footprint for a scan) must
    clear _BLOOM_MIN_TRAIN_BYTES, else the plain exact join is the
    faster plan and this delegates to it. 'bloom' / 'plain' force a
    branch ('bloom' is what the accelerator-equivalence driver query
    pins, so the oracle always checks the accelerated plan)."""
    from .bloom import bloom_prefilter

    if strategy not in ("auto", "bloom", "plain"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        est = int(
            train._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        strategy = "bloom" if est >= _BLOOM_MIN_TRAIN_BYTES else "plain"
    if strategy == "plain":
        return ngram_contamination(train, test, n, text_col, id_col)

    tg = word_ngram_postings(train, n, text_col, id_col, out_id="train_id")
    # The test postings feed THREE consumers (filter sizing, filter
    # build, final join) — materialize them once. localCheckpoint, not
    # persist(): blocks are freed by the ContextCleaner when the frame
    # is collected, and the sizing count below doubles as the eager
    # materialization. The test side is the small side by contract, so
    # the materialized footprint is the one already assumed broadcast-
    # scale by the filter itself.
    sg = word_ngram_postings(test, n, text_col, id_col).localCheckpoint(
        eager=False
    )
    test_grams = sg.select("gram").distinct()
    n_grams = test_grams.count()
    tg = bloom_prefilter(tg, test_grams, "gram", fpp=fpp, n_items=n_grams)
    return (
        sg.join(tg, "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("train_id").alias("n_train_docs_hit"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """Winnowed rolling-hash document fingerprints (Schleimer et al.,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS sketch).

    Slide a window of ``window`` consecutive word-``k``-gram hashes
    over each document and keep each window's MINIMUM hash; the
    distinct kept values are the document's sketch. The winnowing
    guarantee: any substring of at least ``window + k − 1`` shared
    tokens contributes at least one common fingerprint to both
    sketches — unlike whole-document hashing (``fingerprint``) this
    detects PARTIAL overlap, and unlike MinHash the sketch is LOCAL
    (positions far apart can't mask each other).

    Shape: k-gram hashes via the codegen posexplode+lead form, one
    rolling MIN window, DISTINCT — a single doc-keyed shuffle, sketch
    size ≤ n_tokens per doc. (A zero-shuffle per-doc rewrite — array
    HOF transform/slice/array_min over the token array — was measured
    2.4× slower at sf0.1: interpreted lambda hashing costs more than
    the doc-keyed exchange saves. At cluster scale the exchange ships
    (id, pos, token) rows once and the sort is per-doc local; the
    window shuffle is the right trade while HOFs stay interpreted.) ``hash_fn`` defaults to ``xxhash64``;
    pass an engine-portable hash (md5 hex arithmetic) when the sketch
    must be oracle-comparable. Documents shorter than
    ``window + k − 1`` tokens have no complete window and are absent.
    """
    from pyspark.sql import Window as W

    hash_fn = hash_fn or F.xxhash64
    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w_doc = W.partitionBy("_id").orderBy("_pos")
    base = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_t")
    ).filter(F.col("_t") != "")
    gram = F.concat_ws(
        " ", F.col("_t"), *[F.lead("_t", i).over(w_doc) for i in range(1, k)]
    )
    grams = (
        base.select(
            "_id",
            "_pos",
            gram.alias("_g"),
            F.lead("_t", k - 1).over(w_doc).alias("_lasttok"),
        )
        .filter(F.col("_lasttok").isNotNull())
        .select("_id", "_pos", hash_fn(F.col("_g")).alias("_h"))
    )
    roll = (
        W.partitionBy("_id").orderBy("_pos").rowsBetween(-(window - 1), 0)
    )
    return (
        grams.select(
            "_id",
            F.min("_h").over(roll).alias("fp"),
            F.row_number().over(W.partitionBy("_id").orderBy("_pos")).alias("_rn"),
        )
        .filter(F.col("_rn") >= window)  # complete windows only
        .select(F.col("_id").alias(id_col), "fp")
        .distinct()
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents per query (Robertson
    & Zaragoza, "The Probabilistic Relevance Framework: BM25 and
    Beyond", Found. Trends IR 2009 — the Lucene-style
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant, which is
    non-negative for stop-tokens).

    score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) /
                  (tf + k1·(1 − b + b·dl/avgdl))

    Returns ``(query_id, rank, doc_id, score)``.

    Engine portability: per-term contributions are rounded to 9 dp and
    SUMMED AS SCALED BIGINTs — float addition is non-associative and
    Spark's aggregation order is partition-dependent, so a double sum
    could flip near-ties between engines (and between runs); the
    integer sum is order-free and exact, and the emitted score is the
    integer divided by 1e9 (the tfidf_top_terms playbook, applied to a
    cross-row sum). Ranking ties break by doc id ascending.

    Plan shape: corpus is tokenized ONCE into a (doc, token, tf)
    relation, eagerly localCheckpointed — it feeds FOUR consumers
    (document frequencies, document lengths, corpus stats, the scored
    join) whose pruned column sets differ, so ReuseExchange cannot
    collapse them and the un-materialized form re-tokenized the corpus
    3× (measured at sf0.1: 1.85 s → 1.31 s; persist() was SLOWER at
    2.2 s — the semantic_dedup lesson, cache-write overhead vs
    shuffle-file reuse). Query tokens are the broadcast side of the
    postings join, so the corpus-side join carries only postings
    matching some query token — never the whole inventory. N/Σdl ship
    as a broadcast 1-row scalar derived from the tiny per-doc length
    relation. At 100 TB the (token, doc) postings relation is the
    thing to persist token-bucketed; the per-query work is then index
    lookups, exactly like the serving shapes in operators/serving.py."""
    from pyspark.sql import Window

    tok = corpus.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    tf = (
        tok.groupBy("_doc", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("_doc").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    stats = dl.groupBy().agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.transform(tokens(query_text_col), F.lower)).alias("token"),
    ).distinct()
    contrib = (
        "CAST(ROUND("
        "LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(doc_freq AS DOUBLE) + 0.5)"
        " / (CAST(doc_freq AS DOUBLE) + 0.5))"
        f" * (CAST(tf AS DOUBLE) * ({k1!r} + 1.0))"
        f" / (CAST(tf AS DOUBLE) + {k1!r} * (1.0 - {b!r} + {b!r}"
        " * CAST(dl AS DOUBLE)"
        " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
        " * 1e9) AS BIGINT)"
    )
    scored = (
        tf.join(F.broadcast(qt), "token")
        .join(dfreq, "token")
        .join(dl, "_doc")
        .crossJoin(F.broadcast(stats))
        .withColumn("_c", F.expr(contrib))
        .groupBy("query_id", "_doc")
        .agg(F.sum("_c").alias("_score_i"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score_i"), F.asc("_doc")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("_doc").alias(id_col),
            (F.col("_score_i").cast("double") / F.lit(1e9)).alias("score"),
        )
    )


def unigram_logprob_score(
    corpus: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document mean token log-probability under a unigram LM
    trained on ``lm_corpus`` — the cheap LM-quality signal CCNet uses
    (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data", LREC 2020) with a unigram model in
    place of the KenLM 5-gram: documents that look like the reference
    corpus score high, gibberish scores low.

    Model: add-one-smoothed unigram over the LM corpus vocabulary,
    ``p(t) = (c(t) + 1) / (total + V)``; unseen tokens take the
    ``c = 0`` probability. Returns ``(id, n_tokens, avg_logprob)``.

    Engine portability: per-token ``ln p(t)`` is rounded to 9 dp and
    summed as a scaled BIGINT (the bm25_topk playbook) — the per-doc
    mean is then integer-sum / n / 1e9, identical on any engine and
    any partitioning. Plan shape: the LM is a vocabulary-sized
    aggregate (broadcast-joined when it fits); scoring is one
    token-keyed left join + one doc-keyed aggregate. At 100 TB the LM
    side is counts over the reference split only — vocabulary-sized,
    not corpus-sized."""
    lm_tok = lm_corpus.select(
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token")
    )
    lm = lm_tok.groupBy("token").agg(F.count("*").alias("c"))
    stats = lm.groupBy().agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    )
    # `keep` columns ride along per document (grouped with the id) so
    # callers like lm_quality_buckets don't re-scan the corpus just to
    # re-attach a label — the _bigram_pairs pass-through pattern
    tok = corpus.select(
        F.col(id_col).alias("_doc"),
        *[F.col(c) for c in keep],
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    contrib = (
        "CAST(ROUND(LN((CAST(COALESCE(c, 0) AS DOUBLE) + 1.0)"
        " / (CAST(total AS DOUBLE) + CAST(v AS DOUBLE))) * 1e9) AS BIGINT)"
    )
    return (
        tok.join(F.broadcast(lm), "token", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn("_lp", F.expr(contrib))
        .groupBy("_doc", *keep)
        .agg(F.count("*").alias("n_tokens"), F.sum("_lp").alias("_sum"))
        .select(
            F.col("_doc").alias(id_col),
            *keep,
            "n_tokens",
            (
                F.col("_sum").cast("double")
                / F.col("n_tokens").cast("double")
                / F.lit(1e9)
            ).alias("avg_logprob"),
        )
    )


def _bigram_pairs(df: DataFrame, keep, text_col: str) -> DataFrame:
    """(keep..., prev, cur) for every adjacent lowercased token pair —
    map-only (zip of two shifted slices + one generator), no window
    shuffle; documents under two tokens contribute nothing."""
    t = df.withColumn(
        "_t", F.transform(tokens(text_col), F.lower)
    ).filter(F.size("_t") >= 2)
    n1 = F.size("_t") - F.lit(1)
    t = t.withColumn("_pv", F.slice("_t", F.lit(1), n1)).withColumn(
        "_cr", F.slice("_t", F.lit(2), n1)
    )
    return t.select(
        *keep, F.explode(F.arrays_zip("_pv", "_cr")).alias("_bg")
    ).select(
        *keep,
        F.col("_bg._pv").alias("prev"),
        F.col("_bg._cr").alias("cur"),
    )


def bigram_logprob_score(
    corpus: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean transition log-probability under a
    Jelinek-Mercer-interpolated bigram LM trained on ``lm_corpus`` —
    the next step up from ``unigram_logprob_score`` toward CCNet's
    KenLM 5-gram (Wenzek et al., LREC 2020): fluent word ORDER now
    scores high, a bag of in-vocabulary words in scrambled order no
    longer does.

    Model: ``p(w|v) = λ·c(v,w)/c(v) + (1-λ)·(c(w)+1)/(total+V)``; an
    unseen context ``v`` contributes only the smoothed unigram term,
    so every transition has positive probability. Returns
    ``(id, n_bigrams, avg_logprob)`` over documents with ≥2 tokens.

    Engine portability: per-transition ``ln p`` is rounded to 9 dp and
    summed as a scaled BIGINT (the bm25_topk playbook); the
    interpolation expression is written in one fixed operation order
    so both engines produce bit-identical doubles. Plan shape: bigram
    extraction is map-only (two shifted slices zipped — no window
    shuffle); the three LM relations are reference-split-sized
    aggregates broadcast into one token-pair-keyed scoring join. At
    100 TB the reference split stays small by construction (that's
    what makes it a reference); if its bigram table ever outgrows the
    broadcast threshold the same plan works as a pair-keyed
    sort-merge join."""
    # λ = 1 removes the smoothed unigram backoff entirely: an unseen
    # bigram then has probability exactly 0 and LN(0) = -Inf, which
    # the scaled-BIGINT cast turns into a hard error under ANSI mode.
    # The "every transition has positive probability" contract needs
    # the half-open interval.
    if not 0.0 <= lam < 1.0:
        raise ValueError("need 0 <= lam < 1 (lam=1 zeroes unseen bigrams)")
    lmb = _bigram_pairs(lm_corpus, [], text_col).groupBy("prev", "cur").agg(
        F.count("*").alias("cb")
    )
    cc = lmb.groupBy("prev").agg(F.sum("cb").alias("cc"))
    uni = lm_corpus.select(
        F.explode(F.transform(tokens(text_col), F.lower)).alias("cur")
    ).groupBy("cur").agg(F.count("*").alias("c"))
    stats = uni.groupBy().agg(F.sum("c").alias("total"), F.count("*").alias("v"))
    big = _bigram_pairs(
        corpus.select(F.col(id_col).alias("_doc"), F.col(text_col)),
        ["_doc"],
        text_col,
    )
    contrib = (
        f"CAST(ROUND(LN({lam!r} * (CASE WHEN cc IS NULL THEN 0.0"
        " ELSE CAST(COALESCE(cb, 0) AS DOUBLE) / CAST(cc AS DOUBLE) END)"
        f" + {1.0 - lam!r} * (CAST(COALESCE(c, 0) AS DOUBLE) + 1.0)"
        " / (CAST(total AS DOUBLE) + CAST(v AS DOUBLE))) * 1e9) AS BIGINT)"
    )
    return (
        big.join(F.broadcast(lmb), ["prev", "cur"], "left")
        .join(F.broadcast(cc), "prev", "left")
        .join(F.broadcast(uni), "cur", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn("_lp", F.expr(contrib))
        .groupBy("_doc")
        .agg(F.count("*").alias("n_bigrams"), F.sum("_lp").alias("_sum"))
        .select(
            F.col("_doc").alias(id_col),
            "n_bigrams",
            (
                F.col("_sum").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e9)
            ).alias("avg_logprob"),
        )
    )


def kn_bigram_logprob_score(
    corpus: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean transition log-probability under an
    interpolated KNESER-NEY bigram LM trained on ``lm_corpus`` — the
    canonical step past Jelinek-Mercer (``bigram_logprob_score``):
    instead of backing off to how FREQUENT a word is, KN backs off to
    how many distinct CONTEXTS it continues (Kneser & Ney 1995; Chen &
    Goodman 1999 §2.7's interpolated form). "san francisco" no longer
    inflates p(francisco|·) after unseen contexts — francisco follows
    almost nothing else.

    Model, with every quantity an exact aggregate of the reference
    split:

    - discount ``D = n1/(n1 + 2·n2)`` (Chen-Goodman estimate from the
      counts of bigram types seen exactly once/twice), computed
      IN-PLAN from two exact integers — one IEEE division, identical
      in any engine; degenerate reference splits (no singleton or
      doubleton bigrams) fall back to D = 0.5;
    - smoothed continuation ``Pc(w) = (N1+(·,w) + 1)/(T + V)`` where
      ``N1+(·,w)`` = distinct contexts preceding w, ``T`` = distinct
      bigram types, ``V`` = unigram vocabulary (add-one keeps unseen
      words positive — the same smoothing shape the JM variant uses);
    - seen context v: ``p(w|v) = max(c(v,w) − D, 0)/c(v) +
      D·N1+(v,·)/c(v) · Pc(w)`` (``N1+(v,·)`` = distinct continuations
      of v — the discount mass redistributed by continuation count);
    - unseen context: ``p(w|v) = Pc(w)``.

    Returns ``(id, n_bigrams, avg_logprob)`` over documents with ≥ 2
    tokens. Engine portability and plan shape are the
    ``bigram_logprob_score`` playbook verbatim: per-transition ``ln p``
    rounded to 9 dp and summed as a scaled BIGINT; the four LM
    relations (bigram counts, per-context totals+continuation counts,
    per-word context counts, global stats) are reference-split-sized
    aggregates broadcast into one map-only pair-keyed scoring join."""
    lmb = _bigram_pairs(lm_corpus, [], text_col).groupBy("prev", "cur").agg(
        F.count("*").alias("cb")
    )
    # one pass over the bigram-type relation feeds three consumers
    # (context stats, continuation stats, global stats) — materialize
    # once; it is bigram-type-bounded by contract
    lmb = lmb.localCheckpoint(eager=False)
    ctx = lmb.groupBy("prev").agg(
        F.sum("cb").alias("cc"), F.count("*").alias("n1v")
    )
    cont = lmb.groupBy("cur").agg(F.count("*").alias("n1w"))
    vocab = lm_corpus.select(
        F.explode(F.transform(tokens(text_col), F.lower)).alias("_w")
    ).agg(F.countDistinct("_w").alias("v"))
    stats = (
        lmb.agg(
            F.count("*").alias("t_types"),
            F.sum((F.col("cb") == 1).cast("long")).alias("n1"),
            F.sum((F.col("cb") == 2).cast("long")).alias("n2"),
        )
        .crossJoin(F.broadcast(vocab))
    )
    big = _bigram_pairs(
        corpus.select(F.col(id_col).alias("_doc"), F.col(text_col)),
        ["_doc"],
        text_col,
    )
    return (
        big.join(F.broadcast(lmb), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(cont), "cur", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn("_lp", F.expr(kn_contrib_sql()))
        .groupBy("_doc")
        .agg(F.count("*").alias("n_bigrams"), F.sum("_lp").alias("_sum"))
        .select(
            F.col("_doc").alias(id_col),
            "n_bigrams",
            (
                F.col("_sum").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e9)
            ).alias("avg_logprob"),
        )
    )


def kn_contrib_sql() -> str:
    """The per-transition KN log-probability term as ONE expression
    string, interpolated verbatim into BOTH the Spark plan
    (kn_bigram_logprob_score) and the DuckDB oracle — the shared-text
    contract drift cannot survive (the psi_term_sql pattern). Expects
    columns cb, cc, n1v, n1w, t_types, v, n1, n2 in scope; fixed
    operation order throughout (Pc first, then discount, then the
    seen-context mix) so both engines build the identical IEEE chain
    before the single 9-dp rounding."""
    pc = (
        "((CAST(COALESCE(n1w, 0) AS DOUBLE) + 1.0)"
        " / (CAST(t_types AS DOUBLE) + CAST(v AS DOUBLE)))"
    )
    d = (
        "(CASE WHEN COALESCE(n1, 0) + 2 * COALESCE(n2, 0) > 0"
        " THEN CAST(n1 AS DOUBLE)"
        " / (CAST(n1 AS DOUBLE) + 2.0 * CAST(n2 AS DOUBLE))"
        " ELSE 0.5 END)"
    )
    return (
        "CAST(ROUND(LN(CASE WHEN cc IS NULL THEN " + pc
        + " ELSE GREATEST(CAST(COALESCE(cb, 0) AS DOUBLE) - " + d + ", 0.0)"
        " / CAST(cc AS DOUBLE)"
        " + " + d + " * CAST(n1v AS DOUBLE) / CAST(cc AS DOUBLE)"
        " * " + pc + " END) * 1e9) AS BIGINT)"
    )


#: Engine-portable PII patterns — the common RE2/Java-regex subset
#: (no backreferences, no lookaround), so DuckDB oracles replay them
#: verbatim. Deliberately conservative recall: production scanners add
#: locale-specific patterns behind the same counting/masking shape.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII pattern counts + a boolean flag — the audit
    pass a curation pipeline runs before release (count first, mask
    or drop second; see ``pii_redact``).

    One map-only projection (regexp_extract_all per pattern, size) —
    no shuffle, no UDF; scales linearly like the other text passes.
    Returns the input columns plus ``n_<kind>`` per pattern and
    ``has_pii``."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast(
                "long"
            ),
        )
    flag = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask every PII match in place (``[EMAIL]``/``[PHONE]``/
    ``[IPV4]``) — same map-only shape as ``pii_scan``; patterns are
    applied in a fixed order (emails first, so an address's digits are
    gone before the phone pattern could nibble at them)."""
    c = F.col(text_col)
    for kind in ("email", "phone", "ipv4"):
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return df.withColumn(f"{text_col}_redacted", c)


def template_ngrams(
    df: DataFrame,
    n: int = 4,
    min_doc_frac: float = 0.05,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate/template detection: word n-grams that recur across
    an unusually large fraction of one stratum's documents — the
    n-gram analogue of C4's duplicated-line removal (Raffel et al.,
    JMLR 2020 §2.2 drop repeated ≥3-sentence spans; a corpus without
    line structure uses token n-grams as the span unit). Returned
    grams are what a cleanup pass strips or what an auditor reads to
    find template contamination (headers, footers, license blurbs).

    Returns ``(stratum, gram, doc_freq, n_docs, doc_frac)`` for grams
    with ``doc_frac ≥ min_doc_frac``, where doc_freq counts DISTINCT
    documents. Plan: the postings explode is reused from
    word_ngram_postings; one gram-keyed aggregate joined against the
    broadcast per-stratum doc counts. At 100 TB the aggregate output
    is vocabulary×strata-sized, ≪ corpus."""
    posts = word_ngram_postings(df, n, text_col, id_col).join(
        df.select(F.col(id_col).alias("doc_id"), F.col(stratum_col)), "doc_id"
    )
    per = posts.groupBy(stratum_col, "gram").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    totals = df.groupBy(stratum_col).agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    return (
        per.join(F.broadcast(totals), stratum_col)
        .withColumn(
            "doc_frac",
            F.col("doc_freq").cast("double") / F.col("n_docs").cast("double"),
        )
        .filter(F.col("doc_frac") >= F.lit(min_doc_frac))
        .select(
            F.col(stratum_col).alias("stratum"),
            "gram",
            "doc_freq",
            "n_docs",
            F.round("doc_frac", 6).alias("doc_frac"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    min_tokens: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cross-document duplicated-substring spans (the removal
    semantics of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022 — there via suffix arrays; here
    via the relational equivalence that a duplicated substring of
    ≥ ``min_tokens`` tokens exists exactly where a ``min_tokens``-gram
    is shared across documents).

    A token position is covered iff the ``min_tokens``-gram starting
    there also occurs in ANOTHER document; overlapping covered windows
    merge into maximal spans. Returns one row per span:
    ``(id, span_start, span_end, n_span_tokens)`` — token indices,
    inclusive, 0-based — what a cleanup pass slices out (or an auditor
    reads). Within-document repetition alone does NOT create a span
    (cross-doc semantics; the paper's self-dedup variant would drop
    the distinct-document condition).

    Shape: gram postings with positions (the codegen posexplode+lead
    winnow machinery) → gram-keyed duplicate-gram aggregate (df ≥ 2
    DISTINCT docs — vocabulary-sized output) → semi-join back →
    per-doc interval merge with one lag window. Never doc×doc; the
    shuffles are gram-keyed and doc-keyed. At 100 TB the dup-gram
    relation is the corpus' repeated-gram inventory — the thing the
    paper's suffix array also materializes, here as an aggregate.

    Grams are 64-bit xxhash combines of per-token hashes, never
    materialized strings (the hashed_word_shingles trade: identical
    output barring 2⁻⁶⁴ collisions, measured 2.1× faster at sf0.1 on
    this worst-case-repetitive corpus; the DuckDB oracle joins on the
    gram STRINGS, so the driver gate re-proves the equivalence on
    every run)."""
    from pyspark.sql import Window as W

    L = min_tokens
    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w_doc = W.partitionBy("_id").orderBy("_pos")
    base = df.select(
        F.col(id_col).alias("_id"), F.posexplode(toks).alias("_pos", "_t")
    ).filter(F.col("_t") != "").select(
        "_id", "_pos", F.xxhash64("_t").alias("_h")
    )
    gram = F.xxhash64(
        F.col("_h"), *[F.lead("_h", i).over(w_doc) for i in range(1, L)]
    )
    posts = (
        base.select(
            "_id",
            F.row_number().over(w_doc).alias("_tpos"),  # rank among tokens
            gram.alias("_g"),
            F.lead("_h", L - 1).over(w_doc).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("_id", (F.col("_tpos") - 1).alias("pos"), F.col("_g").alias("gram"))
    )
    dup = (
        posts.groupBy("gram")
        .agg(F.count_distinct("_id").alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("gram")
    )
    seeds = posts.join(dup, "gram", "left_semi")
    w_pos = W.partitionBy("_id").orderBy("pos")
    grouped = seeds.withColumn(
        "_new",
        F.when(
            F.col("pos") > F.lag("pos").over(w_pos) + (L - 1), 1
        ).otherwise(0),
    ).withColumn("_grp", F.sum("_new").over(w_pos))
    return (
        grouped.groupBy("_id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (L - 1)).alias("span_end"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "n_span_tokens"
            ),
        )
    )


def bm25_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 20,
    n: int = 5,
    max_jaccard: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Hard-negative mining for retrieval training — the BM25-negatives
    recipe of Karpukhin et al. ("Dense Passage Retrieval", EMNLP 2020):
    per query, the top-ranked document is the presumed positive and the
    candidates ranked below it become training negatives, EXCEPT those
    that near-duplicate the positive (distinct word ``n``-gram Jaccard
    > ``max_jaccard``) — lexically-duplicated "negatives" are usually
    unlabeled positives, the known failure mode of naive BM25 mining.

    Returns ``(query_id, doc_id, bm25_rank, score,
    jaccard_with_pos)`` for every surviving negative.

    Scale: everything after retrieval is bounded by queries×k, not the
    corpus — the gram relation is built over the ≤q·k retrieved docs
    only (corpus semi-joined down first), so at 100 TB this costs one
    bm25_topk plus candidate-sized joins. Jaccard is exact integer set
    arithmetic (|∩| / |pos|+|cand|−|∩|) rounded at 6 dp, so the oracle
    replays it digit-for-digit; a doc shorter than ``n`` tokens has an
    empty gram set and Jaccard 0 by definition (the u = 0 guard)."""
    top = bm25_topk(
        corpus,
        queries,
        k=k,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).localCheckpoint()  # ≤ queries×k rows, reused by four consumers
    pos = top.filter(F.col("rank") == 1).select(
        "query_id", F.col("doc_id").alias("_pos_doc")
    )
    involved = top.select(F.col("doc_id").alias(id_col)).distinct()
    grams = word_ngram_postings(
        corpus.join(F.broadcast(involved), id_col, "left_semi"),
        n,
        text_col,
        id_col,
        out_id="_doc",
    ).localCheckpoint()  # candidate-bounded; feeds three consumers
    sizes = grams.groupBy("_doc").agg(F.count("*").alias("_sz"))
    pos_grams = pos.join(
        grams, pos["_pos_doc"] == grams["_doc"]
    ).select("query_id", "gram")
    cands = top.filter(F.col("rank") >= 2)
    inter = (
        cands.select("query_id", "doc_id")
        .join(grams, F.col("doc_id") == F.col("_doc"))
        .join(pos_grams, ["query_id", "gram"])
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("_i"))
    )
    jacc = (
        "CASE WHEN _u = 0 THEN 0.0 "
        "ELSE ROUND(CAST(_ii AS DOUBLE) / CAST(_u AS DOUBLE), 6) END"
    )
    return (
        cands.join(F.broadcast(pos), "query_id")
        .join(
            F.broadcast(sizes.select(F.col("_doc"), F.col("_sz").alias("_psz"))),
            F.col("_pos_doc") == F.col("_doc"),
            "left",
        )
        .drop("_doc")
        .join(
            F.broadcast(sizes.select(F.col("_doc"), F.col("_sz").alias("_csz"))),
            F.col("doc_id") == F.col("_doc"),
            "left",
        )
        .drop("_doc")
        .join(F.broadcast(inter), ["query_id", "doc_id"], "left")
        .withColumn("_ii", F.coalesce("_i", F.lit(0)))
        .withColumn(
            "_u",
            F.coalesce("_psz", F.lit(0))
            + F.coalesce("_csz", F.lit(0))
            - F.col("_ii"),
        )
        .withColumn("jaccard_with_pos", F.expr(jacc))
        .filter(F.col("jaccard_with_pos") <= max_jaccard)
        .select(
            "query_id",
            "doc_id",
            F.col("rank").alias("bm25_rank"),
            "score",
            "jaccard_with_pos",
        )
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the cheap gibberish/binary-in-text detector: natural language sits
    in a narrow entropy band (~3.5-4.5 bits/char for English), while
    base64 blobs, minified code, and key-mash noise land far above it
    and single-character runs far below. A standard early quality
    gate alongside the rule scores in ``quality_score``.

    ``H = −Σ_c (n_c/N)·log2(n_c/N)`` over the document's exact char
    counts. Returns ``(id, n_chars, entropy)``; documents with empty
    text produce no row (no distribution to measure) — both engines
    agree because the index sequence is empty.

    Engine portability: characters are enumerated by position
    (``SUBSTRING(text, i, 1)`` over a generated 1..N sequence —
    identical 1-indexed semantics in Spark and DuckDB, no split-regex
    edge cases), and each char class's ``−p·log2(p)`` term is rounded
    to 9 dp and summed as a scaled BIGINT. Scale: one (doc, char)
    hash aggregate and one doc aggregate — shuffles keyed by id, rows
    ∝ corpus chars; no UDF, fully codegen."""
    d = df.select(
        F.col(id_col).alias("_doc"), F.col(text_col).alias("_t")
    ).filter(F.length("_t") >= 1)
    chars = d.select(
        "_doc",
        F.explode(F.sequence(F.lit(1), F.length("_t"))).alias("_i"),
        "_t",
    ).select("_doc", F.expr("SUBSTRING(_t, _i, 1)").alias("_c"))
    counts = chars.groupBy("_doc", "_c").agg(F.count("*").alias("_nc"))
    totals = counts.groupBy("_doc").agg(F.sum("_nc").alias("_n"))
    term = (
        "CAST(ROUND(-(CAST(_nc AS DOUBLE) / CAST(_n AS DOUBLE))"
        " * LOG2(CAST(_nc AS DOUBLE) / CAST(_n AS DOUBLE)) * 1e9) AS BIGINT)"
    )
    return (
        counts.join(totals, "_doc")
        .withColumn("_term", F.expr(term))
        .groupBy("_doc", "_n")
        .agg(F.sum("_term").alias("_h_i"))
        .select(
            F.col("_doc").alias(id_col),
            F.col("_n").alias("n_chars"),
            (F.col("_h_i").cast("double") / F.lit(1e9)).alias("entropy"),
        )
    )


def textrank_keywords(
    corpus: DataFrame,
    k: int = 30,
    iterations: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    weighted PageRank over the corpus-level word co-occurrence graph —
    nodes are lowercased tokens, undirected edges weighted by
    adjacent-pair counts (the map-only zip-slice bigram extraction,
    no window shuffle), self-loops dropped. Centrality in that graph
    is the classic unsupervised keyword signal.

    Returns the top-``k`` ``(pos, keyword, rank_i)`` by final rank
    (ties by keyword ascending); ``rank_i`` is the exact scaled-BIGINT
    rank from ``pagerank_scaled`` — integer end-to-end, so the oracle
    compares ranks exactly, no float tolerance anywhere. Scale: edges
    are vocabulary²-bounded (in practice ∝ distinct bigrams); each
    iteration is one edge join + one aggregate; the final top-k ranks
    a vocabulary-sized relation, never the corpus."""
    from pyspark.sql import Window

    from .clustering import pagerank_scaled

    bg = _bigram_pairs(corpus, [], text_col).filter(
        F.col("prev") != F.col("cur")
    )
    und = bg.select(
        F.col("prev").alias("src"), F.col("cur").alias("dst")
    ).unionAll(bg.select(F.col("cur").alias("src"), F.col("prev").alias("dst")))
    e = und.groupBy("src", "dst").agg(F.count("*").cast("long").alias("w"))
    ranks = pagerank_scaled(e, iterations=iterations, weight_col="w")
    # two-phase global top-k (the dsir_gumbel_topk pattern): orderBy +
    # limit is TakeOrderedAndProject — per-partition k-row heaps, then
    # a k-row merge on the driver side of the exchange. The rank
    # window runs AFTER the cut, over k rows, so no full-vocabulary
    # relation ever lands in one partition (the single-partition
    # WindowExec this replaces would bottleneck at a 100 TB corpus's
    # vocabulary).
    top = ranks.orderBy(F.desc("rank_i"), F.asc("node")).limit(int(k))
    win = Window.orderBy(F.desc("rank_i"), F.asc("node"))
    return top.select(
        F.row_number().over(win).cast("int").alias("pos"),
        F.col("node").alias("keyword"),
        "rank_i",
    )


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multiclass Naive Bayes domain classification — the
    routing/tagging stage of a curation pipeline (assign each incoming
    document to a domain before domain-aware mixing): train a
    bag-of-words NB model on labeled documents, predict the class of
    each test document. NB training IS aggregation (closed-form
    counts — no gradient loop), which is what makes this exactly
    replayable by a SQL oracle.

    Model: add-one smoothing; ``score(d, c) = ln P(c)
    + Σ_t ln((cnt(c,t)+1)/(T_c+V))``, V the train vocabulary size.
    Decomposed for sparsity as ``prior(c) + n_tok(d)·floor(c)
    + Σ_{t∈d, cnt(c,t)>0} Δ(c,t)`` with ``floor(c) = ln(1/(T_c+V))``
    and ``Δ(c,t) = ln(cnt(c,t)+1)`` — the unseen-token floor factors
    out, so the token join touches only the SPARSE (class, token)
    relation. Each component rounds to a 9-dp scaled BIGINT once and
    the score is exact integer arithmetic after that (the defined
    recurrence both engines replay identically).

    Returns ``(id, predicted, n_tokens, score)`` — the argmax class
    per test document, ties by class ascending; zero-token documents
    fall back to the prior argmax. Scale: the model is a
    vocabulary×classes aggregate over the LABELED split only
    (broadcast when it fits); scoring is one token-keyed join + one
    (doc, class) aggregate; classes are a small broadcast."""
    from pyspark.sql import Window

    tr_tok = train.select(
        F.col(class_col).alias("_cls"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    lm = tr_tok.groupBy("_cls", "token").agg(F.count("*").alias("_cnt"))
    vocab = lm.select("token").distinct().groupBy().agg(
        F.count("*").alias("_v")
    )
    # the class list comes from DOCUMENT counts, not token counts — a
    # class whose training docs are all token-free must still carry
    # its prior (the documented prior-argmax fallback), not vanish
    # from the crossJoin; its token total defaults to 0. The floor's
    # denominator is guarded to ≥1 so an entirely token-free model
    # degenerates to priors-only instead of LN-of-division-by-zero.
    cls = (
        train.groupBy(F.col(class_col).alias("_cls"))
        .agg(F.count("*").alias("_nd"))
        .join(lm.groupBy("_cls").agg(F.sum("_cnt").alias("_tc")), "_cls", "left")
        .withColumn("_tc", F.coalesce(F.col("_tc"), F.lit(0)))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(
            F.broadcast(
                train.groupBy().agg(F.count("*").alias("_ndall"))
            )
        )
        .select(
            "_cls",
            F.expr(
                "CAST(ROUND(LN(CAST(_nd AS DOUBLE) / CAST(_ndall AS DOUBLE))"
                " * 1e9) AS BIGINT)"
            ).alias("_prior_i"),
            F.expr(
                "CAST(ROUND(LN(1.0 / GREATEST(CAST(_tc AS DOUBLE)"
                " + CAST(_v AS DOUBLE), 1.0)) * 1e9) AS BIGINT)"
            ).alias("_floor_i"),
        )
    )
    delta = lm.select(
        "_cls",
        "token",
        F.expr(
            "CAST(ROUND(LN(CAST(_cnt AS DOUBLE) + 1.0) * 1e9) AS BIGINT)"
        ).alias("_delta_i"),
    )
    te = test.select(
        F.col(id_col).alias("_doc"),
        F.transform(tokens(text_col), F.lower).alias("_t"),
    ).withColumn("_ntok", F.size("_t"))
    te_tok = te.select("_doc", F.explode("_t").alias("token"))
    sdelta = (
        te_tok.join(delta, "token")
        .groupBy("_doc", "_cls")
        .agg(F.sum("_delta_i").alias("_sd"))
    )
    scored = (
        te.select("_doc", "_ntok")
        .crossJoin(F.broadcast(cls))
        .join(sdelta, ["_doc", "_cls"], "left")
        .withColumn(
            "_score_i",
            F.expr(
                "_prior_i + CAST(_ntok AS BIGINT) * _floor_i"
                " + COALESCE(_sd, CAST(0 AS BIGINT))"
            ),
        )
    )
    win = Window.partitionBy("_doc").orderBy(F.desc("_score_i"), F.asc("_cls"))
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_doc").alias(id_col),
            F.col("_cls").alias("predicted"),
            F.col("_ntok").cast("long").alias("n_tokens"),
            (F.col("_score_i").cast("double") / F.lit(1e9)).alias("score"),
        )
    )


def lm_quality_buckets(
    corpus: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al., LREC
    2020 §4.3): score every document under a reference-corpus LM
    (``unigram_logprob_score`` here, standing in for CCNet's KenLM),
    then split each language into score TERCILES — 'head' is the
    best-scoring third that pretraining keeps preferentially. Bucket
    edges are integer rank arithmetic (``rank·3 ≤ n`` / ``≤ 2n``), so
    bucket assignment is exact on any engine — no percentile
    interpolation, ties broken by id. Returns
    ``(id, by, n_tokens, avg_logprob, bucket)``. Scale: scoring is
    the unigram operator's broadcast-LM join; bucketing is one window
    over the by-group key — a single reducer PER LANGUAGE, which is
    the right shape while languages are many and comparable. For one
    dominant language at extreme scale, swap the window for the
    two-phase range-partitioned global ranking
    (plans/round3_queries.py:spend_rank_analytics — per-range local
    ranks + broadcast offsets); bucket edges stay the same integer
    arithmetic."""
    from pyspark.sql import Window

    # the label rides through the scorer (keep=) — no second corpus
    # scan / id-keyed join just to re-attach it
    labeled = unigram_logprob_score(
        corpus, lm_corpus, text_col, id_col, keep=(by_col,)
    )
    w = Window.partitionBy(by_col).orderBy(
        F.desc("avg_logprob"), F.asc(id_col)
    )
    wn = Window.partitionBy(by_col)
    # ceil-based tercile edges (head gets ceil(n/3)): the best-scoring
    # document of ANY language lands in 'head', even for 1- or 2-doc
    # languages — floor-based edges would label a singleton 'tail' and
    # a head-preferring downstream selection would drop the whole
    # language. Zero-token documents have no LM score and therefore no
    # bucket row (they vanish at tokenization) — gate them separately.
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .select(
            id_col,
            by_col,
            "n_tokens",
            "avg_logprob",
            F.when(
                F.col("_rn") <= F.expr("(_n + 2) DIV 3"), F.lit("head")
            )
            .when(
                F.col("_rn") <= F.expr("(2 * _n + 2) DIV 3"),
                F.lit("middle"),
            )
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square keyness: distinctive terms per group vs. the rest
# ---------------------------------------------------------------------------

def chi2_milli_sql() -> str:
    """Shared scalar chi-square expression over BIGINT contingency
    counts named ``a`` (term in group), ``b`` (term elsewhere), ``c``
    (other terms in group), ``d`` (other terms elsewhere), milli-scaled
    to one BIGINT: ``ROUND(1000 * N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)))``.

    ONE string interpolated into BOTH engines (the kn_contrib_sql
    rule), pure rational IEEE arithmetic — products and divisions are
    correctly rounded identically on JVM and DuckDB, unlike POWER/LN
    (Math.pow is only within 1 ulp, so the square is spelled
    ``x * x``). The milli-scaled BIGINT is the ranking key, so
    cross-engine ordering can never drift on a stray ulp."""
    num = (
        "(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
        " - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    )
    den = (
        "(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)"
        " * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))"
    )
    return (
        f"CAST(ROUND(((CAST(a + b + c + d AS DOUBLE)"
        f" * ({num} * {num})) / {den}) * 1000.0) AS BIGINT)"
    )


#: Overrepresentation gate: observed > expected, i.e. a·N > (a+b)(a+c).
#: Compared in DOUBLE — at 10^12 tokens the BIGINT products overflow;
#: near the boundary (observed ≈ expected) chi-square ≈ 0, so a
#:  half-ulp flip there only moves terms that would rank last anyway,
#: and both engines flip identically (same IEEE products).
CHI2_OVERREP_SQL = (
    "CAST(a AS DOUBLE) * CAST(a + b + c + d AS DOUBLE)"
    " > CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)"
)


def chi2_keyness(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` chi-square keyness terms per group — the corpus-
    linguistics "what words make this source/language different"
    audit (Dunning 1993's keyness setup with the chi-square statistic
    instead of G2, which would need LN): for each (group, token) the
    2x2 contingency table against the REST of the corpus, keeping only
    overrepresented terms with at least ``min_count`` occurrences.

    Returns ``(group_col, token, n_in_group, chi2_milli, rk)``.

    Scale: ONE corpus scan builds the (group, token) count relation;
    the token totals, group totals, and the global total are all
    aggregates OVER that relation (AQE reuses its exchange — no second
    corpus scan), so shuffle is vocabulary-sized, never corpus-sized.
    Group totals and the 1-row global total broadcast; the token-total
    join is vocab-keyed. The final top-k window partitions by group
    over the min_count-filtered vocabulary — bounded by the post-gate
    vocab per group, the same profile as bigram_collocations (raw
    frequency top-k); this query ranks by DISTINCTIVENESS instead."""
    from pyspark.sql import Window

    # The upfront null-group filter is ALSO a plan-shape requirement:
    # without it the downstream join pushes IsNotNull(group) into only
    # two of the four count-relation subtrees, splitting their
    # exchange canonicalization — 2 corpus scans instead of 1 scan +
    # 3 ReusedExchange (observed in the sf0.01 final plan).
    counts = (
        docs.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
        )
        .groupBy("g", "token")
        .agg(F.count("*").cast("long").alias("a"))
    )
    tok_tot = counts.groupBy("token").agg(F.sum("a").alias("t_tot"))
    grp_tot = counts.groupBy("g").agg(F.sum("a").alias("g_tot"))
    tot = counts.agg(F.sum("a").alias("tot"))
    f = (
        counts.join(tok_tot, "token")
        .join(F.broadcast(grp_tot), "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "token",
            "a",
            (F.col("t_tot") - F.col("a")).alias("b"),
            (F.col("g_tot") - F.col("a")).alias("c"),
            (F.col("tot") - F.col("t_tot") - F.col("g_tot") + F.col("a")).alias(
                "d"
            ),
        )
        .filter(F.col("a") >= min_count)
        .filter(F.expr(CHI2_OVERREP_SQL))
        .withColumn("chi2_milli", F.expr(chi2_milli_sql()))
    )
    w = Window.partitionBy("g").orderBy(F.desc("chi2_milli"), F.asc("token"))
    return (
        f.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("g").alias(group_col),
            "token",
            F.col("a").alias("n_in_group"),
            "chi2_milli",
            "rk",
        )
    )


def ngram_novelty(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus — the
    inverse view of `ngram_contamination` (memorization / forgetting
    audits ask "how much of this document is new text", e.g. the
    novel-n-gram fraction used when auditing generated text against
    training data, McCoy et al. 2023 "How much do language models
    copy"): for each test document, the fraction of its distinct word
    n-grams that appear NOWHERE in the training corpus.

    Returns ``(doc_id, n_grams, n_seen, novelty_permille)`` for every
    test document that has at least one n-gram; the permille is exact
    integer arithmetic.

    Scale: the training side collapses to its DISTINCT gram inventory
    (no doc identity — a strictly smaller shuffle than
    ngram_contamination's postings); the join is gram-keyed. Total-
    and seen-counts are per-doc aggregates of the same test postings
    relation (exchange reused)."""
    tg = (
        word_ngram_postings(train, n, text_col, id_col)
        .select("gram")
        .dropDuplicates(["gram"])
    )
    sg = word_ngram_postings(test, n, text_col, id_col)
    tot = sg.groupBy(id_col).agg(F.count("*").cast("long").alias("n_grams"))
    seen = (
        sg.join(tg, "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_seen"))
    )
    return (
        tot.join(seen, id_col, "left")
        .withColumn("n_seen", F.coalesce("n_seen", F.lit(0)))
        .withColumn(
            "novelty_permille",
            F.expr("(1000 * (n_grams - n_seen)) DIV n_grams"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_permille: int = 600,
    max_df: int | None = None,
    max_df_permille: int = 100,
) -> DataFrame:
    """Sparse TF-IDF cosine document-pair similarity — the
    bag-of-words complement of embedding cosine (dense) and shingle
    Jaccard (set): candidate pairs come from a POSTING join (docs
    sharing at least one surviving term within a block), and the
    cosine numerator is an exact BIGINT dot product of scaled integer
    weights, so candidate generation and ranking are partition-proof.

    Weights: ``w(d,t) = tf · round(ln(n_docs/df) · 1e3)`` — the
    tfidf_top_terms integer-idf proxy at 1e3 scale, which keeps
    ``Σ w²`` safely inside BIGINT (idf ≤ ~28·10³, tf ≤ docs' token
    counts). Tokens in more than ``max_df_permille``/1000 of the
    corpus (or, if given, more than the absolute ``max_df``) are
    dropped from the VECTORS — dot and norms alike: principled
    df-based stop-wording that must scale WITH the corpus (an
    absolute cap silently empties the vocabulary as n_docs grows —
    measured: 72 pairs at 500 docs became 0 at 5000 under a fixed
    cap). Returns ``(id_a, id_b, dot, cos_sim)`` for pairs with
    cosine ≥ threshold_permille/1000.

    Scale: one corpus scan into (doc, token) tf; df and n_docs are
    aggregates over it; the pair join is token-and-block keyed; norms
    join back by doc id. The posting join's fan-out is O(Σ df²) over
    the surviving vocabulary — stop-wording tames the Zipf head, and
    a web-scale deployment bounds the residual the way the dedup
    family does (rarest-first prefix filtering,
    dedup.py:containment_pairs); this operator pins the weighted-
    cosine semantics those accelerations must preserve."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("token"),
    )
    tf = tok.groupBy("_id", "_blk", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    dfreq = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df")
    )
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    else:
        dfreq = (
            dfreq.crossJoin(F.broadcast(n_docs))
            .filter(
                F.lit(1000) * F.col("df")
                <= F.lit(max_df_permille) * F.col("n_docs")
            )
            .select("token", "df")
        )
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_id",
            "_blk",
            "token",
            F.expr(
                "tf * CAST(ROUND(LN(CAST(n_docs AS DOUBLE) / df) * 1e3)"
                " AS BIGINT)"
            ).alias("wt"),
        )
    )
    norms = w.groupBy("_id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("n2")
    )
    a = w.select(
        F.col("_blk"), F.col("token"), F.col("_id").alias("id_a"),
        F.col("wt").alias("wa"),
    )
    b = w.select(
        F.col("_blk"), F.col("token"), F.col("_id").alias("id_b"),
        F.col("wt").alias("wb"),
    )
    dots = (
        a.join(b, ["_blk", "token"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double"))
        * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        dots.join(norms.select(F.col("_id").alias("id_a"),
                               F.col("n2").alias("_na")), "id_a")
        .join(norms.select(F.col("_id").alias("id_b"),
                           F.col("n2").alias("_nb")), "id_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold_permille / 1000.0)
        .select("id_a", "id_b", "dot", "cos_sim")
    )


def contamination_spans(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level decontamination report — the windowed refinement of
    ``ngram_contamination`` (GPT-3 appendix C / Lee et al. 2022 both
    REMOVE the contaminated window, not the whole document, so a
    pipeline needs WHERE the leakage sits, not just that it exists):
    for each test document, the maximal contiguous token spans covered
    by train-matching ``n``-grams.

    Two matched gram starts p1 < p2 cover one contiguous region iff
    p2 − p1 ≤ n (their [p, p+n−1] token intervals overlap or touch),
    so spans are gaps-and-islands over matched start positions with
    break-gap > n; a span's covered length is last − first + n.
    Returns ``(id_col, n_spans, longest_span, covered_tokens)`` for
    contaminated test docs only (clean docs absent — the
    ngram_contamination roster convention).

    Scale shape: distinct train grams join the test (start, gram) rows
    gram-keyed (never doc×doc); the islands window runs over MATCHED
    test positions only — leakage rows, a vanishing fraction of the
    corpus — partitioned per doc. Nothing windows the corpus.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)

    def starts(df: DataFrame) -> DataFrame:
        # dense surviving-token positions + complete grams, one
        # doc-keyed window (the word_ngram_rows posexplode+lead form,
        # keeping the start position)
        w = Window.partitionBy("_id").orderBy("_raw")
        base = df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(toks).alias("_raw", "_t"),
        ).filter(F.col("_t") != "")
        gram = F.concat_ws(
            " ", F.col("_t"), *[F.lead("_t", i).over(w) for i in range(1, n)]
        )
        return base.select(
            "_id",
            (F.row_number().over(w) - 1).alias("_pos"),
            gram.alias("gram"),
            F.lead("_t", n - 1).over(w).alias("_probe"),
        ).filter(F.col("_probe").isNotNull())

    # train side needs only its DISTINCT gram inventory — the plain
    # postings builder (no row_number pass over train tokens)
    tg = (
        word_ngram_postings(train, n, text_col, id_col)
        .select("gram")
        .distinct()
    )
    m = (
        starts(test)
        .join(tg, "gram", "semi")
        .select(F.col("_id").alias(id_col), "_pos")
    )
    wd = Window.partitionBy(id_col).orderBy("_pos")
    brk = (
        F.col("_pos") - F.lag("_pos").over(wd) > F.lit(n)
    ).cast("int")
    isl = F.sum(F.coalesce(brk, F.lit(0))).over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        m.withColumn("_isl", isl)
        .groupBy(id_col, "_isl")
        .agg((F.max("_pos") - F.min("_pos") + n).alias("_span"))
    )
    return spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_spans"),
        F.max("_span").cast("long").alias("longest_span"),
        F.sum("_span").cast("long").alias("covered_tokens"),
    )


def positioned_tokens(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(_id, _pos, _t)``: engine-safe tokens with 0-based CONSECUTIVE
    positions per doc (empties dropped, then re-based via row_number) —
    the position-enumerated relation span excision rebuilds from.
    Exposed so an ingest caller can materialize it once and share the
    tokenize+explode+window shuffle between the contamination screen
    and the excision (decontam_ingest ``emit_cleaned``)."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w = Window.partitionBy("_id").orderBy("_raw")
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(toks).alias("_raw", "_t"),
        )
        .filter(F.col("_t") != "")
        .select("_id", (F.row_number().over(w) - 1).alias("_pos"), "_t")
    )


def grams_from_positions(pos: DataFrame, n: int) -> DataFrame:
    """``(_id, _pos, gram)`` n-gram start rows over a
    ``positioned_tokens`` relation — same gram set as
    ``word_ngram_rows`` (grams over consecutive surviving tokens),
    with the start position carried for span logic. A narrow window
    pass when ``pos`` is already materialized/partitioned by ``_id``."""
    from pyspark.sql import Window

    wp = Window.partitionBy("_id").orderBy("_pos")
    gram = F.concat_ws(
        " ", F.col("_t"), *[F.lead("_t", i).over(wp) for i in range(1, n)]
    )
    return (
        pos.select(
            "_id",
            "_pos",
            gram.alias("gram"),
            F.lead("_t", n - 1).over(wp).alias("_probe"),
        )
        .filter(F.col("_probe").isNotNull())
        .select("_id", "_pos", "gram")
    )


def remove_contaminated_spans(
    docs: DataFrame,
    eval_set: DataFrame | None,
    n: int = 13,
    margin: int = 0,
    min_segment_tokens: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_grams: DataFrame | None = None,
    positions: DataFrame | None = None,
) -> DataFrame:
    """The ACTION side of ``contamination_spans``: excise every
    contaminated token window from ``docs`` (the remove-the-window
    policy of the GPT-3 appendix / Lee et al. 2022 that the span
    report exists to serve) and emit the decontaminated corpus as
    standalone segments.

    Semantics, all pinned by the DuckDB twin: a doc's contaminated
    spans are the ``contamination_spans`` islands over eval-matching
    ``n``-gram starts, widened by ``margin`` tokens on each side
    (clamped at the doc head). Every token covered by any widened
    span is removed; the survivors split into maximal runs of
    consecutive positions, each emitted as one segment with the
    whitespace-normalized rebuilt text. Segments of a FLAGGED doc
    shorter than ``min_segment_tokens`` are dropped (excision debris
    is not trainable); clean docs pass through as their single
    ``#0`` segment exempt from the floor (nothing was cut, so
    nothing is debris). Docs with zero engine-safe tokens emit no
    rows. Returns ``(id_col, segment_id = "<id>#<k>", seg_index,
    n_tokens, text)`` with ``seg_index`` dense per doc in position
    order. Conservation invariant (tested): at ``margin=0,
    min_segment_tokens=1``, surviving + removed token counts equal
    the doc's token count exactly.

    Scale shape: gram screening is the ``contamination_spans`` plan
    (eval gram inventory semi-join, islands window over MATCHED
    positions only). The rebuild then FORKS: clean docs — the
    overwhelming majority — take a map-only expression path (no
    explode, no window); only flagged docs' tokens pay the
    explode + span anti-join (doc-keyed equi join, spans per doc
    are few) + segment windows. Nothing windows the clean corpus.

    Pass ``eval_grams`` (a relation with a ``gram`` column — e.g. the
    decontam-ingest firewall's pinned ``testgrams/`` postings) instead
    of ``eval_set`` to screen against a pre-materialized gram
    inventory without re-tokenizing the eval corpus per call; exactly
    one of the two must be provided.

    Pass ``positions`` (a materialized ``positioned_tokens(docs)``
    relation — the caller guarantees it was built from THE SAME
    ``docs``/``text_col``) to skip this call's own tokenize pass —
    the decontam-ingest seam that lets the per-batch contamination
    screen and the excision share one tokenize+explode shuffle.
    """
    from pyspark.sql import Window

    if n < 1 or margin < 0 or min_segment_tokens < 1:
        raise ValueError(
            "need n >= 1, margin >= 0, min_segment_tokens >= 1"
        )
    if (eval_set is None) == (eval_grams is None):
        raise ValueError(
            "provide exactly one of eval_set (docs to tokenize) or "
            "eval_grams (pre-materialized gram postings)"
        )

    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    pos = (
        positions
        if positions is not None
        else positioned_tokens(docs, text_col, id_col)
    )
    grams = grams_from_positions(pos, n)
    if eval_grams is not None:
        eg = eval_grams.select("gram").distinct()
    else:
        eg = (
            word_ngram_postings(eval_set, n, text_col, id_col)
            .select("gram")
            .distinct()
        )
    m = grams.join(eg, "gram", "semi").select("_id", "_pos")
    wd = Window.partitionBy("_id").orderBy("_pos")
    brk = (F.col("_pos") - F.lag("_pos").over(wd) > F.lit(n)).cast("int")
    isl = F.sum(F.coalesce(brk, F.lit(0))).over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        m.withColumn("_isl", isl)
        .groupBy("_id", "_isl")
        .agg(
            F.greatest(F.min("_pos") - margin, F.lit(0)).alias("_lo"),
            (F.max("_pos") + F.lit(n - 1 + margin)).alias("_hi"),
        )
        .select(F.col("_id").alias("_sid"), "_lo", "_hi")
    )
    # The span relation is TINY (flagged docs × islands) but sits
    # under three consumers (clean-fork roster, flagged-fork roster,
    # the excision anti-join); left lazy, Catalyst re-executes the
    # whole corpus gram-screening pipeline once per consumer — two
    # extra full-corpus passes at the 100 TB target. Materialize it
    # once (the ids.py eager-localCheckpoint precedent).
    spans = spans.localCheckpoint(eager=True)
    flagged = spans.select(F.col("_sid").alias("_id")).distinct()

    # clean fork: map-only rebuild, no explode/window/join per row
    ctoks = F.filter(toks, lambda t: t != F.lit(""))
    clean = (
        docs.join(flagged, docs[id_col] == flagged["_id"], "left_anti")
        .select(F.col(id_col), ctoks.alias("_ct"))
        .filter(F.size("_ct") > 0)
        .select(
            id_col,
            F.lit(0).cast("long").alias("seg_index"),
            F.size("_ct").cast("long").alias("n_tokens"),
            F.array_join("_ct", " ").alias("text"),
        )
    )

    # flagged fork: anti-join tokens out of the widened spans, then
    # gaps-and-islands over the SURVIVING positions (break on gap > 1)
    fpos = pos.join(flagged, "_id", "semi")
    surv = fpos.join(
        spans,
        (fpos["_id"] == spans["_sid"])
        & (fpos["_pos"] >= spans["_lo"])
        & (fpos["_pos"] <= spans["_hi"]),
        "left_anti",
    )
    sbrk = (F.col("_pos") - F.lag("_pos").over(wd) != 1).cast("int")
    sseg = F.sum(F.coalesce(sbrk, F.lit(0))).over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    segs = (
        surv.withColumn("_seg", sseg)
        .groupBy("_id", "_seg")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.min("_pos").alias("_start"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_t"))),
                    lambda s: s["_t"],
                ),
                " ",
            ).alias("text"),
        )
        .filter(F.col("n_tokens") >= min_segment_tokens)
    )
    ws = Window.partitionBy("_id").orderBy("_start")
    cut = segs.select(
        F.col("_id").alias(id_col),
        (F.row_number().over(ws) - 1).cast("long").alias("seg_index"),
        "n_tokens",
        "text",
    )
    out = clean.unionByName(cut)
    return out.select(
        id_col,
        F.concat_ws(
            "#",
            F.col(id_col).cast("string"),
            F.col("seg_index").cast("string"),
        ).alias("segment_id"),
        "seg_index",
        "n_tokens",
        "text",
    )


def ngram_clipped_precision(
    pairs: DataFrame,
    n: int = 2,
    pair_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
) -> DataFrame:
    """BLEU-style clipped n-gram precision per (candidate, reference)
    text pair (Papineni et al. 2002 §2.1) — the pairwise overlap score
    a generated-data pipeline uses to filter distilled samples against
    their references (too-high = verbatim copy, too-low = off-target)
    and an eval harness uses for cheap quality tracking.

    For every order i ≤ ``n``: ``matched_i`` = Σ over distinct grams
    of min(candidate count, reference count) — the clipping that stops
    a candidate repeating one reference gram from scoring; ``total_i``
    = candidate gram occurrences; ``p_i`` = matched/total (NULL when
    the candidate has no order-i grams). Plus both token lengths (the
    inputs of any brevity penalty — the exp() itself is left to the
    caller: cross-engine IEEE exp diverges by ulps, the HLL-ln
    lesson, so the CONTRACT surface stays integer-exact + single
    divisions). Multiset counting is exact integer throughout.

    Shape: both sides explode to (pair, order, gram) counts — the
    shuffle is (pair, gram)-keyed, never pair×pair; the clip is one
    inner join of the two count relations; per-pair rollup is a
    bounded conditional aggregate. Pairs stream independently — at
    100 TB this parallelizes per pair with no global state."""
    if n < 1:
        raise ValueError("n must be >= 1")

    # Melt both pair sides into one (struct(pid, side), text) relation
    # and build EVERY gram order in one tokenize+window pass
    # (word_multi_ngram_rows) — the previous per-side × per-order
    # builder calls paid 2n tokenize+window passes plus 2n evaluations
    # of the ``pairs`` join for gram sets one pass provides. The count
    # relation is lazily checkpointed: the clip join reads it for both
    # sides and the totals aggregate reads the candidate side again.
    sides = pairs.select(
        F.col(pair_col).alias("_pid"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("s"), F.col(cand_col).alias("t")
                ),
                F.struct(F.lit(1).alias("s"), F.col(ref_col).alias("t")),
            )
        ).alias("_e"),
    ).select(
        F.struct(F.col("_pid"), F.col("_e.s").alias("_side")).alias("_cid"),
        F.col("_e.t").alias("_txt"),
    )
    counts = (
        word_multi_ngram_rows(
            sides, n, text_col="_txt", id_col="_cid", out_id="_cid"
        )
        .groupBy("_cid", "_ord", "gram")
        .agg(F.count("*").alias("_n"))
        .localCheckpoint(eager=False)
    )
    c = counts.filter(F.col("_cid._side") == 0).select(
        F.col("_cid._pid").alias("_pid"),
        "_ord",
        "gram",
        F.col("_n").alias("_cc"),
    )
    r = counts.filter(F.col("_cid._side") == 1).select(
        F.col("_cid._pid").alias("_pid"),
        "_ord",
        "gram",
        F.col("_n").alias("_rc"),
    )
    matched = (
        c.join(r, ["_pid", "_ord", "gram"])
        .groupBy("_pid", "_ord")
        .agg(F.sum(F.least("_cc", "_rc")).alias("_m"))
    )
    totals = c.groupBy("_pid", "_ord").agg(F.sum("_cc").alias("_tot"))
    per_ord = totals.join(matched, ["_pid", "_ord"], "left").withColumn(
        "_m", F.coalesce("_m", F.lit(0))
    )
    aggs = []
    for order in range(1, n + 1):
        is_o = F.col("_ord") == order
        m = F.sum(F.when(is_o, F.col("_m")))
        t = F.sum(F.when(is_o, F.col("_tot")))
        aggs += [
            F.coalesce(m, F.lit(0)).cast("long").alias(f"matched_{order}"),
            F.coalesce(t, F.lit(0)).cast("long").alias(f"total_{order}"),
        ]
    rolled = per_ord.groupBy("_pid").agg(*aggs)
    def _tok_len(col: str) -> F.Column:
        # size(NULL array) is -1 in Spark — NULL text counts 0 tokens
        sz = F.size(
            F.filter(
                F.split(F.trim(F.col(col)), ENGINE_SAFE_WS),
                lambda t: t != "",
            )
        )
        return F.greatest(sz, F.lit(0)).cast("long")

    lens = pairs.select(
        F.col(pair_col).alias("_pid"),
        _tok_len(cand_col).alias("len_cand"),
        _tok_len(ref_col).alias("len_ref"),
    )
    out = lens.join(rolled, "_pid", "left")
    for order in range(1, n + 1):
        m, t = f"matched_{order}", f"total_{order}"
        out = (
            out.withColumn(m, F.coalesce(F.col(m), F.lit(0)))
            .withColumn(t, F.coalesce(F.col(t), F.lit(0)))
            .withColumn(
                f"p_{order}",
                F.when(
                    F.col(t) > 0, F.col(m).cast("double") / F.col(t)
                ),
            )
        )
    return out.withColumnRenamed("_pid", pair_col)
