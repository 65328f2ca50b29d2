"""Distributed BPE tokenizer induction (merge-step mining).

Byte-pair encoding (Gage 1994; Sennrich et al., ACL 2016 for NMT
subwords) trains by repeatedly merging the most frequent adjacent
symbol pair. The scale design is the one real tokenizer trainers
(HuggingFace ``tokenizers``, SentencePiece BPE) use: the corpus is
first compressed to the DISTINCT-WORD frequency table — pair counts
and merges then run over the vocabulary (≈10⁶-10⁷ rows at web scale),
never the corpus, so each merge iteration is a vocabulary-sized
aggregate no matter how many tokens the corpus holds.

Engine-portable representation: a word's current symbol segmentation
is one string with every symbol WRAPPED as ``\\x1e sym \\x1f``
(record-separator open, unit-separator close). Merging pair (a, b) is
then the plain literal replace of ``\\x1ea\\x1f\\x1eb\\x1f`` with
``\\x1eab\\x1f`` — matches are anchored at whole-symbol boundaries on
BOTH sides (no false hit when ``a`` or ``b`` is a prefix/suffix of a
longer symbol) and two matches can never overlap (a match consumes
whole symbols and the markers are distinct chars), so replacement
order cannot matter and Spark's ``F.replace`` and DuckDB's
``REPLACE`` provably agree. For a same-symbol run ("aaa" merging
(a,a)) leftmost-first non-overlapping replace is exactly canonical
BPE's leftmost-first iterative merge.

Everything stays in exact integer arithmetic (counts), the argmax
tie-break is total (count desc, lhs asc, rhs asc), and the k-step
loop is unrolled into ONE static DataFrame plan — each step's 1-row
best-pair relation broadcast-cross-joined into the next replace, the
``mmr_rerank`` idiom. Both the vocabulary and the 1-row best are
``localCheckpoint``-ed per step: each is referenced by two downstream
subtrees (the next pair count AND the next replace / the output
union), so un-checkpointed lineage would double per step (the
exponential-plan gotcha mmr_rerank hit, 4.2 → 2.3 s after fixing).

No analog in the reference pipeline (its transform layer is
KPI aggregation, reference src/process_data.py); this module is
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .packing import ENGINE_SAFE_WS

#: Symbol wrap markers. Control chars never produced by the
#: whitespace tokenizer's token bodies in practice; both engines strip
#: them from words defensively (identically) so a hostile document
#: cannot corrupt the segmentation encoding.
SYM_OPEN = "\x1e"
SYM_CLOSE = "\x1f"


def _word_freqs(corpus: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word frequency table — the corpus-compression step.

    One corpus scan + one word-keyed shuffle; everything after runs
    on this relation. Marker stripping happens downstream in
    ``bpe_merges_from_freqs`` (shared with the ingest-state path)."""
    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    w = corpus.select(F.explode(toks).alias("word")).filter(
        F.col("word") != ""
    )
    return w.groupBy("word").agg(F.count("*").cast("long").alias("freq"))


def _wrapped(col: str | Column) -> Column:
    """Initial segmentation: every char its own wrapped symbol."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(.)", f"{SYM_OPEN}$1{SYM_CLOSE}")


def _pair_counts(words: DataFrame) -> DataFrame:
    """freq-weighted adjacent-symbol pair counts (zip-slice, map-only
    until the pair-keyed aggregate)."""
    syms = F.split(F.replace(F.col("s"), F.lit(SYM_CLOSE), F.lit("")), SYM_OPEN)
    n = F.size(syms) - 1  # leading empty element before the first open
    pr = F.arrays_zip(
        F.slice(syms, F.lit(2), n - 1).alias("lhs"),
        F.slice(syms, F.lit(3), n - 1).alias("rhs"),
    )
    return (
        words.filter(n >= 2)
        .select("freq", F.explode(pr).alias("p"))
        .groupBy(
            F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def _symbol_counts(words: DataFrame) -> DataFrame:
    """freq-weighted occurrence count of every current symbol —
    WordPiece's scoring denominator. Same exploded relation shape as
    the pair counts, one vocabulary-sized aggregate."""
    syms = F.split(F.replace(F.col("s"), F.lit(SYM_CLOSE), F.lit("")), SYM_OPEN)
    n = F.size(syms) - 1
    return (
        words.select("freq", F.explode(F.slice(syms, F.lit(2), n)).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").cast("long").alias("sym_count"))
    )


def _bpe_merges_driver(
    spark, vocab_pd, k: int, scoring: str
) -> tuple[DataFrame, DataFrame]:
    """In-memory merge mining over a collected ``(word, freq)``
    vocabulary — the driver twin of the distributed loop below,
    picked cost-based by ``bpe_merges_from_freqs`` (the
    connected_components escape hatch applied to tokenizer training:
    production BPE trainers aggregate word counts distributed and run
    the merge loop in memory, because the loop's state is the
    vocabulary, not the corpus).

    Exactness contract, mirrored operation for operation:
    - segmentations live in the SAME wrapped-string encoding and
      merges apply via ``str.replace`` — identical left-to-right
      overlap-free semantics as ``F.replace``;
    - argmax ordering is (score desc, pair_count desc, lhs asc, rhs
      asc); Python string comparison is code-point order ≡ Spark's
      UTF8 binary order;
    - the WordPiece score reproduces the JVM float pipeline exactly:
      double(pair) / (double(lhs_count) * double(rhs_count)) with
      each int rounded to double BEFORE the product (a Python
      ``f / (cl * cr)`` would divide by the exact integer product —
      ulp-different);
    - a step with no pairs left stops emitting merges AND empties the
      returned vocabulary, because the distributed loop's crossJoin
      against an empty argmax relation does exactly that."""
    words = [(str(w), int(f)) for w, f in zip(vocab_pd["word"], vocab_pd["freq"])]
    seg = {
        w: "".join(SYM_OPEN + ch + SYM_CLOSE for ch in w) for w, _ in words
    }
    merges_rows: list[tuple] = []
    exhausted = False
    for step in range(1, k + 1):
        pair_counts: dict = {}
        sym_counts: dict = {}
        for w, f in words:
            syms = seg[w].replace(SYM_CLOSE, "").split(SYM_OPEN)[1:]
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pair_counts[key] = pair_counts.get(key, 0) + f
            if scoring == "wordpiece":
                for s in syms:
                    sym_counts[s] = sym_counts.get(s, 0) + f
        if not pair_counts:
            exhausted = True
            break
        if scoring == "wordpiece":
            best = min(
                pair_counts.items(),
                key=lambda kv: (
                    -(
                        float(kv[1])
                        / (
                            float(sym_counts[kv[0][0]])
                            * float(sym_counts[kv[0][1]])
                        )
                    ),
                    -kv[1],
                    kv[0][0],
                    kv[0][1],
                ),
            )
        else:
            best = min(
                pair_counts.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )
        (lhs, rhs), cnt = best
        merges_rows.append((step, lhs, rhs, cnt))
        pat = SYM_OPEN + lhs + SYM_CLOSE + SYM_OPEN + rhs + SYM_CLOSE
        rep = SYM_OPEN + lhs + rhs + SYM_CLOSE
        for w, _ in words:
            seg[w] = seg[w].replace(pat, rep)
    merges_df = spark.createDataFrame(
        merges_rows, "step int, lhs string, rhs string, pair_count long"
    )
    out_rows = [] if exhausted else [(w, f, seg[w]) for w, f in words]
    words_df = spark.createDataFrame(
        out_rows, "word string, freq long, s string"
    )
    return merges_df, words_df


def bpe_merges_from_freqs(
    freqs: DataFrame,
    k: int = 6,
    scoring: str = "freq",
    driver_vocab_threshold: int = 200_000,
) -> tuple[DataFrame, DataFrame]:
    """Mine the first ``k`` merges from a ``(word, freq)``
    relation — the core ``bpe_merges`` wraps with a corpus scan, and
    the path that trains STRAIGHT FROM INGEST STATE: summed
    vocabulary cells (streaming/vocab_ingest.py) are exactly this
    relation, so a tokenizer retrains from accumulated state without
    ever re-reading the corpus (tests/test_vocab_ingest.py pins the
    equivalence).

    Input words are marker-stripped and re-aggregated defensively
    (identical to the corpus path), so both entrances share one
    normalization.

    ``scoring='freq'`` is classic BPE (Sennrich: most frequent pair
    wins); ``scoring='wordpiece'`` is the WordPiece likelihood rule
    (Schuster & Nakajima 2012, the HF-documented variant): merge the
    pair maximizing pair_count/(cnt_lhs·cnt_rhs) — the merge whose
    parts co-occur most beyond chance, which favors gluing rare
    morphemes over piling onto frequent chars.

    Physical strategy is cost-based: the loop's working state is the
    VOCABULARY, so when it holds ≤ ``driver_vocab_threshold`` distinct
    words (one limit-probe collect decides — the
    connected_components pattern) the k-step loop runs in driver
    memory (``_bpe_merges_driver``, exactness contract there) instead
    of paying ~3 Spark jobs per step on a broadcast-sized relation;
    realistic word vocabularies (1M words ≈ tens of MB) fit easily,
    and adversarially huge ones keep the distributed loop. Set
    ``driver_vocab_threshold=0`` to force distributed."""
    norm = (
        freqs.select(
            F.regexp_replace("word", f"[{SYM_OPEN}{SYM_CLOSE}]", "").alias(
                "word"
            ),
            "freq",
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    if driver_vocab_threshold:
        vocab_pd = norm.limit(driver_vocab_threshold + 1).toPandas()
        if len(vocab_pd) <= driver_vocab_threshold:
            return _bpe_merges_driver(
                freqs.sparkSession, vocab_pd, int(k), scoring
            )
    words = norm.withColumn("s", _wrapped("word")).localCheckpoint(
        eager=False
    )
    merges: list[DataFrame] = []
    for step in range(1, int(k) + 1):
        pairs = _pair_counts(words)
        if scoring == "wordpiece":
            # WordPiece likelihood score: pair / (cnt_lhs · cnt_rhs).
            # BIGINT→DOUBLE casts and one IEEE division are
            # correctly-rounded in both JVM and DuckDB (unlike
            # transcendentals), so the float is SAFE in an ORDER BY;
            # ties break on exact integers.
            syms = _symbol_counts(words)
            pairs = (
                pairs.join(
                    syms.select(
                        F.col("sym").alias("lhs"),
                        F.col("sym_count").alias("_cl"),
                    ),
                    "lhs",
                )
                .join(
                    syms.select(
                        F.col("sym").alias("rhs"),
                        F.col("sym_count").alias("_cr"),
                    ),
                    "rhs",
                )
                .withColumn(
                    "_score",
                    F.col("pair_count").cast("double")
                    / (
                        F.col("_cl").cast("double")
                        * F.col("_cr").cast("double")
                    ),
                )
            )
            order = [
                F.desc("_score"),
                F.desc("pair_count"),
                F.asc("lhs"),
                F.asc("rhs"),
            ]
        else:
            order = [F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")]
        best = (
            pairs.orderBy(*order)
            .limit(1)
            .select("lhs", "rhs", "pair_count")
            .localCheckpoint(eager=False)
        )
        merges.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                "lhs",
                "rhs",
                "pair_count",
            )
        )
        pat = F.concat(
            F.lit(SYM_OPEN),
            F.col("lhs"),
            F.lit(SYM_CLOSE + SYM_OPEN),
            F.col("rhs"),
            F.lit(SYM_CLOSE),
        )
        rep = F.concat(
            F.lit(SYM_OPEN), F.col("lhs"), F.col("rhs"), F.lit(SYM_CLOSE)
        )
        words = (
            words.crossJoin(F.broadcast(best))
            .withColumn("s", F.replace(F.col("s"), pat, rep))
            .select("word", "freq", "s")
            .localCheckpoint(eager=False)
        )
    if not merges:  # k=0: untrained tokenizer, every char its own token
        out = freqs.sparkSession.createDataFrame(
            [], "step int, lhs string, rhs string, pair_count long"
        )
    else:
        out = merges[0]
        for m in merges[1:]:
            out = out.unionAll(m)
    return out, words


def bpe_merges(
    corpus: DataFrame, k: int = 6, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Mine the first ``k`` BPE merges from ``corpus``.

    Returns ``(merges, words)``: ``merges`` is the ordered merge table
    ``(step, lhs, rhs, pair_count)`` — the trained tokenizer — and
    ``words`` is the final ``(word, freq, s)`` vocabulary with each
    word's segmentation after all ``k`` merges (``s`` in the wrapped
    encoding), ready for corpus-side encoding via a word equi-join.

    Scale: the corpus is scanned once (word frequencies); each of the
    ``k`` steps is one vocabulary-sized aggregate + one map-side
    replace, with the 1-row argmax broadcast — no corpus-sized state
    ever re-shuffles, matching how production BPE trainers scale to
    arbitrarily large corpora with vocabulary-bounded memory."""
    return bpe_merges_from_freqs(_word_freqs(corpus, text_col), k=k)


def bpe_encode_lengths(
    corpus: DataFrame,
    k: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    trained_words: DataFrame | None = None,
) -> DataFrame:
    """Per-document BPE token counts under the ``k``-merge tokenizer
    trained on the same corpus (default) or a tokenizer trained
    elsewhere (``trained_words`` = the vocabulary relation
    ``bpe_merges`` returns) — the compression-ratio audit that tells a
    data pipeline what a tokenizer change does to its token budget
    before anyone retrains.

    Returns ``(doc_id, n_words, n_bpe_tokens)``. A word's token count
    is the number of open markers in its final segmentation, read off
    the trained vocabulary — so encoding is ONE corpus scan
    left-joined to the vocabulary on ``word``. Words outside the
    training vocabulary (possible only in the cross-corpus case) fall
    back to their char count — the untrained segmentation, a
    conservative upper bound (merges that would apply to an unseen
    word's chars are NOT replayed; real serving encoders apply the
    merge list, which is O(k) string ops per distinct unseen word —
    the same vocabulary-compression trick would apply)."""
    if trained_words is None:
        trained_words = bpe_merges(corpus, k=k, text_col=text_col)[1]
    per_word = trained_words.select(
        "word",
        (
            F.length("s")
            - F.length(F.replace(F.col("s"), F.lit(SYM_OPEN), F.lit("")))
        )
        .cast("long")
        .alias("w_tokens"),
    )
    toks = F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
    doc_words = (
        corpus.select(id_col, F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .select(
            id_col,
            F.regexp_replace(
                "word", f"[{SYM_OPEN}{SYM_CLOSE}]", ""
            ).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        doc_words.join(per_word, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.coalesce(F.col("w_tokens"), F.length("word")))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def wordpiece_merges(
    corpus: DataFrame, k: int = 6, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """WordPiece-scored merge mining (see ``bpe_merges_from_freqs``):
    same vocabulary-compressed loop as BPE, argmax by the likelihood
    score pair/(lhs·rhs) instead of raw pair frequency."""
    return bpe_merges_from_freqs(
        _word_freqs(corpus, text_col), k=k, scoring="wordpiece"
    )
