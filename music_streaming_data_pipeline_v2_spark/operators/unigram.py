"""Distributed unigram-LM tokenizer induction (SentencePiece's model;
Kudo, ACL 2018) — the third of the big-three subword trainers next to
BPE and WordPiece (operators/bpe.py).

Training is hard-EM over the DISTINCT-WORD frequency relation (the
same corpus-compression the BPE trainer uses — per-iteration work is
vocabulary-sized regardless of corpus token count):

- **seed vocabulary**: every substring of length 1..L of every word,
  scored by the summed frequency of the words containing it (counted
  once per occurrence), cut to the top V multi-char pieces — plus ALL
  single characters, unconditionally, so every word stays segmentable
  (SentencePiece's required-character rule).
- **E-step**: per word, the VITERBI segmentation under the current
  piece counts. Scoring is EXACT: a segmentation into pieces with
  counts c₁..c_k has probability Πcᵢ/Tᵏ; two candidates compare by
  the cross-multiplied big-integer products ``Πcᵢ · T^m  vs
  Πc'ⱼ · T^k`` — no floating point anywhere, so the argmax is total
  (ties: fewer pieces, then the lexicographically smaller piece list)
  and the result is partition-, engine-, and platform-deterministic.
  The DP runs in an Arrow ``mapInPandas`` kernel over the word
  relation (self-contained, stdlib only — the multimodal pickle
  rule); expected-count output rows are bounded by pieces-per-word.
- **M-step**: piece counts re-aggregate in Spark (one vocabulary-sized
  groupBy), single characters floored at count 1 so coverage never
  collapses. The loop is a driver-side ``for`` over K iterations with
  vocabulary-sized collects only (the codebook-broadcast argument:
  even a 10⁶-piece production vocabulary broadcasts in tens of MB).

Hard-EM (Viterbi counts) rather than full forward-backward EM: the
standard lightweight variant — counts stay exact integers, which is
what makes the whole trainer reproducible bit-for-bit. Verified
against an INDEPENDENT brute-force reference (enumerate all 2^(n-1)
segmentations, score with exact Fractions) in tests/test_unigram.py.

No analog in the reference pipeline; training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bpe import _word_freqs

__all__ = [
    "unigram_seed_vocab",
    "unigram_train",
    "unigram_token_lengths",
    "viterbi_kernel",
]


def unigram_seed_vocab(
    words: DataFrame, max_piece_len: int = 4, vocab_size: int = 120
) -> DataFrame:
    """Seed (piece, count) relation from a (word, freq) relation:
    top-``vocab_size`` multi-char substrings by summed occurrence
    frequency (count desc, piece asc — a total order) UNION all
    single characters with their exact frequencies.

    Plan: one flatten/transform substring explosion over the word
    relation (map-only), one piece-keyed aggregate, one
    TakeOrderedAndProject cut — never a corpus scan."""
    L = int(max_piece_len)
    if L < 1:
        raise ValueError("max_piece_len must be >= 1")
    subs = words.select(
        F.explode(
            F.expr(
                f"""flatten(transform(
                        sequence(1, least({L}, char_length(word))),
                        len -> transform(
                            sequence(0, char_length(word) - len),
                            i -> substring(word, i + 1, len))))"""
            )
        ).alias("piece"),
        "freq",
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("count"))
    singles = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(int(vocab_size))
    )
    return singles.unionByName(multi)


def viterbi_kernel(vocab: dict, total: int, mode: str):
    """Self-contained Arrow kernel factory over a (word, freq) frame.

    ``mode='counts'`` emits per-batch (piece, count) partial sums of
    the Viterbi-best segmentation weighted by word frequency;
    ``mode='lengths'`` emits (word, n_tokens). The DP compares
    candidate prefix scores with exact cross-multiplied big integers —
    see the module docstring — so both modes are deterministic."""
    if mode not in ("counts", "lengths"):
        raise ValueError("mode must be 'counts' or 'lengths'")
    vocab = dict(vocab)
    total = int(total)
    max_len = max((len(p) for p in vocab), default=1)

    def kernel(batches):
        import pandas as pd

        def best_segmentation(word):
            # best[i]: (prod, k, pieces) for word[:i] — prod = Π counts,
            # k = piece count; compare a,b by prod_a*T^kb vs prod_b*T^ka,
            # ties -> smaller k, then lexicographically smaller pieces
            n = len(word)
            best = [None] * (n + 1)
            best[0] = (1, 0, [])
            for i in range(1, n + 1):
                for j in range(max(0, i - max_len), i):
                    if best[j] is None:
                        continue
                    c = vocab.get(word[j:i])
                    if not c:
                        continue
                    pj, kj, sj = best[j]
                    cand = (pj * c, kj + 1, sj + [word[j:i]])
                    cur = best[i]
                    if cur is None:
                        best[i] = cand
                        continue
                    lhs = cand[0] * pow(total, cur[1])
                    rhs = cur[0] * pow(total, cand[1])
                    if lhs > rhs or (
                        lhs == rhs
                        and (cand[1], cand[2]) < (cur[1], cur[2])
                    ):
                        best[i] = cand
            return best[n][2] if best[n] is not None else None

        for pdf in batches:
            if mode == "counts":
                acc: dict = {}
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    seg = best_segmentation(word)
                    if seg is None:
                        continue
                    for p in seg:
                        acc[p] = acc.get(p, 0) + int(freq)
                if acc:
                    yield pd.DataFrame(
                        {"piece": list(acc), "count": list(acc.values())}
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "piece": pd.Series([], dtype="object"),
                            "count": pd.Series([], dtype="int64"),
                        }
                    )
            else:
                toks = []
                for word in pdf["word"]:
                    seg = best_segmentation(word)
                    toks.append(len(seg) if seg is not None else None)
                yield pd.DataFrame({"word": pdf["word"], "n_tokens": toks})

    return kernel


def unigram_train(
    corpus: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    vocab_size: int = 120,
    iterations: int = 2,
) -> DataFrame:
    """Train the unigram vocabulary on ``corpus``; returns the final
    (piece, count) relation (exact integers — the model's probability
    of a piece is count / Σcounts). One corpus scan builds the
    distinct-word relation; everything after runs on it
    (``unigram_train_from_words``)."""
    words = _word_freqs(
        corpus.select(F.lower(F.col(text_col)).alias(text_col)), text_col
    )
    return unigram_train_from_words(
        words, max_piece_len, vocab_size, iterations
    )


def unigram_train_from_words(
    words: DataFrame,
    max_piece_len: int = 4,
    vocab_size: int = 120,
    iterations: int = 2,
) -> DataFrame:
    """The trainer core over a ``(word, freq)`` relation — shared by
    the batch path and the vocab-ingest retrain path
    (streaming/vocab_ingest.py:query_unigram_vocab), the
    ``bpe_merges_from_freqs`` split.

    Per iteration: one Arrow pass over the word relation + one
    piece-keyed aggregate + one vocabulary-sized collect. Pieces whose
    Viterbi count falls to zero drop out (the EM pruning step);
    single characters are floored at 1 so coverage never collapses."""
    words = words.localCheckpoint()
    seed = unigram_seed_vocab(words, max_piece_len, vocab_size)
    vocab = {r["piece"]: int(r["count"]) for r in seed.collect()}
    singles = {p for p in vocab if len(p) == 1}
    spark = words.sparkSession
    for _ in range(int(iterations)):
        total = sum(vocab.values())
        counts = words.mapInPandas(
            viterbi_kernel(vocab, total, "counts"),
            schema="piece string, count long",
        )
        agg = counts.groupBy("piece").agg(F.sum("count").alias("count"))
        new = {r["piece"]: int(r["count"]) for r in agg.collect()}
        for p in singles:  # required-character floor
            new[p] = max(new.get(p, 0), 1)
        vocab = {p: c for p, c in new.items() if c > 0}
    return spark.createDataFrame(
        sorted(vocab.items()), "piece string, count long"
    )


def unigram_token_lengths(
    corpus: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under a trained unigram vocabulary:
    segment the DISTINCT words once (Arrow Viterbi kernel), then one
    corpus scan equi-joins per-word lengths back — the
    ``bpe_encode_lengths`` shape. Returns
    ``(id_col, n_tokens, n_unsegmentable)``.

    Cross-vocab safety: a word containing a character absent from the
    vocabulary has no segmentation (the kernel returns NULL). Such
    words fall back to their CHAR COUNT — ``bpe_encode_lengths``'s
    untrained-segmentation upper bound — instead of silently dropping
    out of the sum, and ``n_unsegmentable`` counts them per document
    so a vocab/corpus mismatch is loud. Same-corpus vocabularies
    contain every corpus character (the trainer floors single chars
    at count 1), so there the fallback never fires and
    ``n_unsegmentable`` is 0."""
    vd = {r["piece"]: int(r["count"]) for r in vocab.collect()}
    total = sum(vd.values())
    lowered = corpus.select(
        F.col(id_col), F.lower(F.col(text_col)).alias(text_col)
    )
    words = _word_freqs(lowered, text_col).localCheckpoint()
    lengths = words.select("word", "freq").mapInPandas(
        viterbi_kernel(vd, total, "lengths"),
        schema="word string, n_tokens long",
    )
    from .packing import ENGINE_SAFE_WS

    exploded = lowered.select(
        id_col,
        F.explode(
            F.split(F.trim(F.col(text_col)), ENGINE_SAFE_WS)
        ).alias("word"),
    ).filter(F.col("word") != "")
    return (
        exploded.join(lengths, "word", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("n_tokens"), F.length("word").cast("long"))
            ).alias("n_tokens"),
            F.count(F.when(F.col("n_tokens").isNull(), True))
            .cast("long")
            .alias("n_unsegmentable"),
        )
    )
