"""Deduplication operators: exact and near-duplicate, at corpus scale.

Extension surface (SURVEY.md §7 phase 6) — the operators a 100 TB
training-data pipeline needs. All are expressed as DataFrame
compositions (no Python UDFs in any hot path):

- exact: hash-groupBy on a normalized fingerprint — one shuffle on the
  hash, keeps the minimum doc_id per group (deterministic canonical).
- MinHash + LSH: shingle → K minhashes via ``xxhash64(shingle, seed)``
  → band → explode bands → self-join on (band_id, band_hash) buckets.
  The self-join is on tiny bucket keys, not documents — the classic
  sub-quadratic near-dup plan. Candidate pairs are then verified with
  exact Jaccard over shingle sets.
- SimHash: 64-bit signature from per-token hash bits weighted ±1;
  near-dups = signatures within a Hamming radius, bucketed by 4
  16-bit chunks (pigeonhole: radius ≤ 3 ⇒ at least one chunk equal).
- n-gram Jaccard: exact similarity over character-n-gram or word sets
  with array_intersect/array_union — the verifier primitive, also
  usable standalone with a blocking key.

Scale notes: every self-join here is blocked (LSH band buckets /
SimHash chunks / explicit blocking key), so candidate generation is
O(Σ bucket²) not O(n²); skewed buckets (boilerplate shingles) are the
main risk — cap bucket width with a count filter before the join
(``max_bucket`` below), exactly like production LSH pipelines drop
stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized content: keep min(id) per distinct
    text. groupBy on the md5 fingerprint → single shuffle whose key is
    a 32-char hash, not the document body (shuffle volume ∝ ids, not
    corpus bytes)."""
    norm = F.lower(F.concat_ws(" ", tokens(text_col)))
    return (
        df.withColumn("_fp", F.md5(norm))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash-LSH
# ---------------------------------------------------------------------------


def word_shingles(col: str | Column = "text", k: int = 3) -> Column:
    """Distinct word k-shingles (k consecutive tokens joined by a
    space), built with a zip_with chain — no UDF.

    Structured exactly like ``hashed_word_shingles``: the k−1
    ``zip_with`` passes concatenate SLICES of the token array, and the
    lambdas touch only their lambda variables. The earlier
    sequence+transform form captured the full tokenize expression
    inside its lambda, and interpreted higher-order functions
    re-evaluate captured subexpressions per element — re-tokenizing
    the document once PER SHINGLE POSITION, O(positions × doc length)
    per row (measured 8.9 s of the 10.1 s minhash_drop_stats_oracle
    run at sf0.1 just assembling shingle strings; this form is ~30×
    cheaper, identical output)."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(acc)


def hashed_word_shingles(col: str | Column = "text", k: int = 3) -> Column:
    """Distinct word k-shingles as 64-bit hashes (``array<long>``).

    The string form (`word_shingles`) materializes every shingle as a
    k-word string — measured at sf0.1 that string assembly (a slice +
    concat_ws per position through interpreted higher-order functions)
    dominated the whole MinHash pipeline (~3.5 s of a ~5 s run). This
    form never builds shingle strings: tokens are hashed to longs once,
    then each k-shingle hash is a chain of ``xxhash64(prev, next)``
    combines over k−1 ``zip_with`` passes — O(k·n) long-hashing instead
    of O(k·n) string building (~4× faster end-to-end, same distinct
    counts on the bench corpus).

    Downstream equivalences: MinHash signatures only need a hashable
    shingle identity, and Jaccard over distinct hashed shingles equals
    Jaccard over the shingles themselves unless two distinct shingles
    collide in 64 bits (P ≈ |a|·|b|/2⁶⁴ per pair — negligible at any
    corpus scale; the standard trade in production near-dup pipelines).
    """
    toks = tokens(col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    m = F.greatest(F.size(th) - (k - 1), F.lit(0))
    acc = F.slice(th, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(acc, F.slice(th, j, m), lambda a, b: F.xxhash64(a, b))
    return F.array_distinct(acc)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """K independent minhashes: min over xxhash64(shingle, seed_i).
    Deterministic, JVM-side, vectorized."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def _band_postings_from_base(
    base: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(_id, band_id, band_hash) LSH index rows from a (_id, _sh)
    shingle relation.

    Signature via explode → flat per-(doc, shingle) rows → K hash
    COLUMNS → groupBy(doc) with K min aggregates. This whole-stage-
    codegens (plain column expressions), where the equivalent
    array_min(transform(...)) per hash walks the shingle array K
    times through interpreted higher-order functions (~10× slower
    measured at sf0.1). Wide column lists built as SQL strings — one
    py4j parse per expression instead of per node; see
    simhash_signatures for the measured plan-build cost rationale.
    """
    rows_per_band = num_hashes // bands
    exploded = base.select("_id", F.explode("_sh").alias("_s"))
    hashed = exploded.select(
        "_id",
        *[F.expr(f"xxhash64(_s, {i}) AS _h{i}") for i in range(num_hashes)],
    )
    sig = hashed.groupBy("_id").agg(
        *[F.expr(f"min(_h{i}) AS _h{i}") for i in range(num_hashes)]
    )
    band_structs = ", ".join(
        "struct({b} AS band_id, xxhash64(concat_ws(',', {cols})) AS band_hash)".format(
            b=b,
            cols=", ".join(
                f"cast(_h{i} AS string)"
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sig.select(
        "_id",
        F.expr(f"explode(array({band_structs}))").alias("_band"),
    ).select("_id", "_band.band_id", "_band.band_hash")


def minhash_band_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    shingles_col: str | None = None,
) -> DataFrame:
    """Public LSH index builder: (doc_id, band_id, band_hash) rows for
    ``df``'s documents — what an incremental near-dup index persists
    per batch (streaming/dedup_ingest.py). Deterministic given the
    same hash parameters, so postings built in different batches/runs
    are comparable.

    ``shingles_col`` names a precomputed ``hashed_word_shingles``
    column to build from (skipping the shingle pass) — for callers
    that already materialized the sketch for other uses, like the
    ingest index, which also verifies candidates and persists it."""
    sh = (
        F.col(shingles_col)
        if shingles_col is not None
        else hashed_word_shingles(text_col, shingle_k)
    )
    base = df.select(F.col(id_col).alias("_id"), sh.alias("_sh")).filter(
        F.size("_sh") > 0
    )
    return _band_postings_from_base(base, num_hashes, bands).withColumnRenamed(
        "_id", id_col
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 1000,
    persist_shingles: bool = True,
    with_stats: bool = False,
):
    """Near-duplicate pairs via MinHash banding.

    Returns (id_a, id_b, jaccard) with id_a < id_b and exact-verified
    jaccard ≥ threshold. rows = candidate pairs only; the full n² is
    never materialized.

    Shingles are 64-bit hashes (`hashed_word_shingles`): signatures
    hash them again per seed, and the exact-Jaccard verify runs
    array_intersect/union over longs — identical jaccard values to
    string shingles barring a 2⁻⁶⁴-per-pair collision. The hashed form
    also makes the persisted relation compact (8 bytes per shingle
    instead of the k-word string).

    ``persist_shingles`` caches the (id, shingle-set) relation, which
    is read three times (signature build + both sides of candidate
    verification) — shingling is the dominant per-row cost, so this
    nearly halves wall-clock. Disable when the shingled corpus exceeds
    cluster cache capacity; the plan then recomputes from the scan.

    ``with_stats=True`` returns ``(pairs_df, stats_df)`` where
    ``stats_df`` is one row quantifying what the ``max_bucket`` cap
    discarded: ``dropped_buckets``, ``dropped_rows`` (doc×band
    postings in those buckets) and ``dropped_candidate_pairs``
    (Σ c·(c−1)/2 — the candidate comparisons skipped). The cap is the
    standard boilerplate defense (a shingle shared by 10M docs would
    otherwise create a 10M-wide bucket ≈ 5·10¹³ candidates), but at
    100 TB an unreported cap makes recall claims unfalsifiable — the
    stats side-output is how a pipeline decides whether dropped mass
    needs a second pass (e.g. exact-dedup the boilerplate first). It
    is derived from the bucket-size relation the filter already
    computes, so the extra cost is one tiny aggregate.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        hashed_word_shingles(text_col, shingle_k).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    if persist_shingles:
        base = base.persist()

    banded = _band_postings_from_base(base, num_hashes, bands)

    # drop pathological buckets (boilerplate): cap candidate fan-out
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("_bn")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("_bn") <= max_bucket).select("band_id", "band_hash"),
        ["band_id", "band_hash"],
    )
    drop_stats = (
        bucket_sizes.filter(F.col("_bn") > max_bucket)
        .agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("_bn"), F.lit(0)).alias("dropped_rows"),
            F.coalesce(
                # integer DIV keeps the SUM in long arithmetic: SQL `/` is
                # double division, and a double-accumulated count loses
                # exactness past 2^53 — reachable, since one pathological
                # bucket can contribute ~5e13 candidate pairs.
                F.sum(F.expr("(_bn * (_bn - 1)) DIV 2")), F.lit(0).cast("long")
            ).alias("dropped_candidate_pairs"),
        )
    )

    cand = (
        banded.select("band_id", "band_hash", F.col("_id").alias("id_a"))
        .join(
            banded.select("band_id", "band_hash", F.col("_id").alias("id_b")),
            ["band_id", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact-Jaccard verification: fetch both shingle sets by id (the
    # candidate set is tiny relative to the corpus, so these are
    # ordinary keyed joins, not array payloads dragged through banding)
    verified = (
        cand.join(base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a")
        .join(base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b")
    )
    jac = F.size(F.array_intersect("_sh_a", "_sh_b")) / F.size(
        F.array_union("_sh_a", "_sh_b")
    )
    pairs = (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if with_stats:
        return pairs, drop_stats
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# Per-doc distinct-token cap shared by both SimHash forms. Keeps the
# lane-packed bit-count sums overflow-free (32767 * 0x0001000100010001
# is the largest multiple that fits a signed long, so ANSI mode can
# never see an overflow) while leaving any real document untouched —
# 32k DISTINCT tokens in one doc is a pathological multi-MB blob.
_SIMHASH_MAX_TOKENS = 32767

# 4 × 16-bit lanes per long: shifting the token hash right by j and
# masking leaves bits {j, j+16, j+32, j+48} in separate lanes, so ONE
# long sum accumulates four bit-counts at once (SIMD-within-a-register).
_LANE_MASK = 0x0001000100010001


def simhash64(col: str | Column = "text") -> Column:
    """63-bit SimHash of the whitespace tokens (sign bit unused so the
    value stays non-negative): per-bit majority vote over
    xxhash64(token) bits, built from bitwise ops + aggregate — no UDF."""
    toks = F.slice(
        F.array_distinct(F.transform(tokens(col), F.lower)),
        1,
        _SIMHASH_MAX_TOKENS,
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1),
        )
        for i in range(63)  # skip the sign bit: keep the result non-negative
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, signature) via the codegen-friendly explode form: one row
    per distinct token, one xxhash64 column, then LANE-PACKED bit-count
    aggregation — 16 sums of ``(hash >>> j) & 0x0001000100010001``
    accumulate all 63 per-bit one-counts four-at-a-time in 16-bit
    lanes, unpacked after the aggregate (5000 rows, not 250k). The
    majority vote ``2*ones > n_tokens`` equals the ±1-vote sign, so
    results are bit-identical to ``simhash64`` while doing 16+1
    aggregate columns of work instead of 63.

    Documents with zero tokens (empty/whitespace-only text) vanish
    under explode, so the aggregate is left-joined back to the full id
    set with the signature defaulting to 0 — matching ``simhash64``
    exactly on those rows too."""
    toks = F.explode(
        F.slice(
            F.array_distinct(F.transform(tokens(text_col), F.lower)),
            1,
            _SIMHASH_MAX_TOKENS,
        )
    ).alias("_t")
    hashed = df.select(F.col(id_col).alias("_id"), toks).select(
        "_id", F.xxhash64("_t").alias("_h")
    )
    # Wide expressions are built as SQL strings parsed in ONE py4j
    # round-trip each: constructing the 63-term majority-vote column
    # (and the 16 lane sums) node-by-node through the Python Column API
    # costs hundreds of driver→JVM calls — measured >1s of pure
    # plan-build time per run at any data size. Identical expressions,
    # just assembled JVM-side.
    packed = hashed.groupBy("_id").agg(
        F.expr("count(*) AS _n"),
        *[
            F.expr(
                f"sum(shiftrightunsigned(_h, {j}) & {_LANE_MASK}L) AS _s{j}"
            )
            for j in range(16)
        ],
    )
    sig_sql = " + ".join(
        f"(CASE WHEN (shiftrightunsigned(_s{i % 16}, {16 * (i // 16)})"
        f" & 65535L) * 2 > _n THEN {1 << i}L ELSE 0L END)"
        for i in range(63)
    )
    sigs = packed.select("_id", F.expr(sig_sql).alias("_sim"))
    ids = df.select(F.col(id_col).alias("_id"))
    return ids.join(sigs, "_id", "left").select(
        "_id", F.coalesce("_sim", F.lit(0).cast("long")).alias("_sim")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Blocking: split the 64-bit signature into 4 16-bit chunks; any pair
    within radius 3 shares ≥1 exact chunk (pigeonhole), so the
    self-join runs per-chunk bucket, never all-pairs.
    """
    sig = simhash_signatures(df, text_col, id_col)
    chunked = sig.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned("_sim", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("_c"),
    ).select("_id", "_sim", "_c.chunk_id", "_c.chunk_val")

    left = chunked.select(
        "chunk_id", "chunk_val",
        F.col("_id").alias("id_a"), F.col("_sim").alias("sim_a"),
    )
    right = chunked.select(
        "chunk_id", "chunk_val",
        F.col("_id").alias("id_b"), F.col("_sim").alias("sim_b"),
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    # hamming is a pure function of the two signatures, so the radius
    # filter commutes with the pair-dedup — apply it FIRST to shrink
    # the dropDuplicates shuffle to only the surviving near-dup pairs
    # (most chunk-bucket candidates are far apart and die here)
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verifier / standalone with blocking)
# ---------------------------------------------------------------------------


def _jaccard_base(
    df: DataFrame, block_col: str, text_col: str, id_col: str
) -> DataFrame:
    """(_id, _blk, _tok): the deduped-token relation every strategy
    shares. Tokens are 64-bit hashes of the lowered words, not the
    strings — every consumer (bitmask dictionary encode, prefix-filter
    ordering, array_intersect/union verify, identical-set contraction
    fingerprint) needs only token IDENTITY and a consistent total
    order, both of which the hash preserves exactly barring a
    2⁻⁶⁴-per-pair collision (the same trade as hashed_word_shingles,
    with the same payoffs: the persisted relation is 8 bytes/token and
    set operations compare longs, not strings)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.array_distinct(
            F.transform(tokens(text_col), lambda t: F.xxhash64(F.lower(t)))
        ).alias("_tok"),
    )


def _jaccard_verify(cand: DataFrame, base: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of an (id_a, id_b) candidate set."""
    jac = F.size(F.array_intersect("tok_a", "tok_b")) / F.size(
        F.array_union("tok_a", "tok_b")
    )
    return (
        cand.join(
            base.select(F.col("_id").alias("id_a"), F.col("_tok").alias("tok_a")),
            "id_a",
        )
        .join(
            base.select(F.col("_id").alias("id_b"), F.col("_tok").alias("tok_b")),
            "id_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    strategy: str = "auto",
    salt: int | None = None,
) -> DataFrame:
    """Exact word-set Jaccard pairs ≥ threshold within a blocking key.

    Two physical strategies, selected cost-based (``strategy='auto'``):

    - **prefix** — two-sided prefix-filtered set-similarity join
      (Bayardo et al., "Scaling Up All Pairs Similarity Search",
      WWW'07 — the AllPairs/PPJoin family). Tokens are ordered
      rarest-first by per-block document frequency; each document
      keeps only its first |x| − ⌈t·|x|⌉ + 1 tokens, and candidates
      come from an equi-join on those prefix tokens. The prefix-filter
      lemma makes the join LOSSLESS (any pair with J ≥ t shares a
      prefix token under a consistent global order); exact
      verification removes false candidates, and the t·|x| ≤ |y| ≤
      |x|/t length filter prunes further. Candidate bounds are
      loosened by an epsilon so float rounding can only ADD candidates
      (exact verify discards them), never drop a true pair. The right
      plan for realistic Zipfian corpora, where rare-token postings
      are tiny and candidates ≪ n².
    - **allpairs** — the salted quadratic self-join
      (``jaccard_pairs_allpairs``). Wins when the vocabulary is so
      small relative to the corpus that prefix postings are fat and
      candidates approach n² anyway (then prefix bookkeeping + the
      candidate dedup + verify joins cost more than comparing
      everything in-join).

    ``auto`` builds the prefix relation (needed by the prefix path
    regardless), computes the EXACT candidate count Σ c·(c−1)/2 over
    prefix postings with one tiny aggregate, and falls back to
    allpairs when candidates exceed 15% of the quadratic pair count —
    the measured break-even (sf0.1, 5k docs, 23-token vocab-dense
    synthetic docs: prefix 31.7 s vs allpairs 18.2 s at 53% candidate
    ratio; equal outputs). This is stats-driven physical planning at
    the operator level — the same decision AQE makes per-stage, made
    here where the quadratic blow-up is invisible to input-size-based
    planning.
    """
    if strategy not in ("auto", "prefix", "allpairs"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "allpairs":
        return jaccard_pairs_allpairs(
            df, block_col, text_col, id_col, threshold, salt
        )

    base = _jaccard_base(df, block_col, text_col, id_col).filter(
        F.size("_tok") > 0
    )
    return _jaccard_pairs_from_base(base, threshold, strategy, salt)


def _jaccard_pairs_from_base(
    base: DataFrame,
    threshold: float,
    strategy: str = "auto",
    salt: int | None = None,
) -> DataFrame:
    """prefix/auto strategy body over a prebuilt (_id, _blk, _tok)
    relation — shared by ``jaccard_pairs`` and the identical-set
    contraction path in clustering.dedup_clusters_exact.

    ``auto`` probes a third physical strategy first: when every
    block's distinct-token vocabulary fits in 64 symbols, each token
    SET is dictionary-encoded into one 64-bit bitmask and Jaccard
    becomes ``bit_count(a & b) / bit_count(a | b)`` — whole-stage-
    codegen integer ops, no per-pair array walks. Small vocabularies
    are exactly the corpora where prefix filtering degenerates
    (postings ≈ n, candidates ≈ n²), so the two strategies cover
    opposite ends: Zipfian text → prefix filter; dense categorical /
    tag-like token sets → bitmask all-pairs. The vocabulary probe is
    one tiny aggregate over the distinct (block, token) relation."""
    eps = 1e-9
    base = base.persist()  # read for prefix build + both verify sides

    if strategy == "auto":
        vocab_max = _max_block_vocab(base)
        if 0 < vocab_max <= 64:
            return _jaccard_bitmask_allpairs(
                base,
                threshold,
                salt or base.sparkSession.sparkContext.defaultParallelism,
            )

    t = base.select(
        "_id", "_blk", F.size("_tok").alias("_n"), F.explode("_tok").alias("_t")
    )
    freq = t.groupBy("_blk", "_t").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_t"))
    prefix_len = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n") - eps) + 1
    pre = (
        t.join(freq, ["_blk", "_t"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
    )

    if strategy == "auto":
        pre = pre.persist()
        cand_est = (
            pre.groupBy("_blk", "_t")
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) / 2")))
            .first()[0]
            or 0
        )
        pairs_est = (
            base.groupBy("_blk")
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")))
            .first()[0]
            or 0
        )
        if cand_est > 0.15 * pairs_est:
            # fall back to the quadratic join, REUSING the persisted
            # token relation the stats pass just materialized (the
            # tokenize+scan is the dominant shared cost).
            pre.unpersist()
            return _jaccard_allpairs_join(
                base,
                threshold,
                salt or base.sparkSession.sparkContext.defaultParallelism,
            )

    a = pre.select(
        "_blk", "_t", F.col("_id").alias("id_a"), F.col("_n").alias("n_a")
    )
    b = pre.select(
        "_blk", "_t", F.col("_id").alias("id_b"), F.col("_n").alias("n_b")
    )
    cand = (
        a.join(b, ["_blk", "_t"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b") - eps)
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a") - eps)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _jaccard_verify(cand, base, threshold)


def jaccard_pairs_allpairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    salt: int | None = None,
) -> DataFrame:
    """Exact word-set Jaccard via the salted all-pairs self-join —
    the brute-force twin of ``jaccard_pairs`` (chosen by its ``auto``
    mode for small-vocabulary corpora where prefix filtering can't
    prune; see the strategy discussion there).

    The blocking key bounds the join fan-out (per-block ~n_b²); a
    low-cardinality block key (e.g. 5 languages) would run the whole
    quadratic comparison on ≤5 tasks, so the self-join is salted: the
    left side keys on hash(id) % salt and the right side replicates
    across all salt values — every pair still meets exactly once (in
    the left doc's cell), but the work spreads over |blocks| × salt
    tasks. ``salt`` defaults to the cluster's default parallelism;
    replication multiplies the right side's shuffle volume by salt,
    the price of parallelizing an all-pairs comparison.
    """
    n_salt = salt or df.sparkSession.sparkContext.defaultParallelism
    # empty token sets can never reach a positive threshold and their
    # 0/0 Jaccard is NULL in SQL (and a divide-by-zero under ANSI) —
    # exclude them up front, matching the prefix path's semantics
    base = _jaccard_base(df, block_col, text_col, id_col).filter(
        F.size("_tok") > 0
    )
    return _jaccard_allpairs_join(base, threshold, n_salt)


def _jaccard_allpairs_join(
    base: DataFrame, threshold: float, n_salt: int
) -> DataFrame:
    """Salted quadratic join over a prebuilt (_id, _blk, _tok) relation."""
    left = base.select(
        F.col("_blk"),
        F.pmod(F.xxhash64("_id"), F.lit(n_salt)).alias("_salt"),
        F.col("_id").alias("id_a"),
        F.col("_tok").alias("tok_a"),
    )
    right = base.select(
        F.col("_blk"),
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
        F.col("_id").alias("id_b"),
        F.col("_tok").alias("tok_b"),
    )
    jac = F.size(F.array_intersect("tok_a", "tok_b")) / F.size(
        F.array_union("tok_a", "tok_b")
    )
    # Spread the probe side across the salt cells EXPLICITLY: with a
    # small dimension AQE broadcasts the other side and would otherwise
    # probe from the scan's own partitioning (often 1 file = 1 task) —
    # and since the quadratic blow-up happens INSIDE the join, input-
    # size-based planning can't see it.
    left = left.repartition(n_salt, "_blk", "_salt")
    # Length prefilter BEFORE the set ops: J(x,y) ≥ t requires
    # t·|x| ≤ |y| ≤ |x|/t, and comparing two ints is ~100× cheaper
    # than intersecting two token arrays. eps-loosened so rounding can
    # only admit extra candidates (the exact filter removes them).
    eps = 1e-9
    len_ok = (
        F.size("tok_a") >= F.lit(threshold) * F.size("tok_b") - F.lit(eps)
    ) & (F.size("tok_b") >= F.lit(threshold) * F.size("tok_a") - F.lit(eps))
    return (
        left.join(right, ["_blk", "_salt"])
        .filter((F.col("id_a") < F.col("id_b")) & len_ok)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_bitmask_allpairs(
    base: DataFrame, threshold: float, n_salt: int
) -> DataFrame:
    """Salted all-pairs Jaccard over 64-bit token-set bitmasks.

    Preconditions (checked by the caller): per-block vocabulary ≤ 64.
    Each block gets a dense token dictionary (alphabetic order — any
    deterministic order works, ids only need to be consistent within
    the block); a document's token set becomes ``sum(1 << id)``, which
    equals the bitwise OR because ``_tok`` is already distinct. The
    pair compare is then two bit_counts on longs — no array
    materialization crosses the shuffle (masks are 8 bytes vs ~hundreds
    for token arrays), so shuffle volume drops by the same factor as
    compare cost. Exact: |x ∩ y| = popcount(a & b), |x ∪ y| =
    popcount(a | b) under any injective token→bit mapping.
    """
    masks = _block_bitmasks(base)
    left = masks.select(
        "_blk",
        F.pmod(F.xxhash64("_id"), F.lit(n_salt)).alias("_salt"),
        F.col("_id").alias("id_a"),
        F.col("_mask").alias("mask_a"),
    ).repartition(n_salt, "_blk", "_salt")
    right = masks.select(
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
        F.col("_id").alias("id_b"),
        F.col("_mask").alias("mask_b"),
    )
    inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b")))
    union = F.bit_count(F.col("mask_a").bitwiseOR(F.col("mask_b")))
    return (
        left.join(right, ["_blk", "_salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _block_bitmasks(base: DataFrame) -> DataFrame:
    """(_blk, _id, _mask): per-block 64-bit dictionary encoding of the
    token sets — the shared front half of the bitmask all-pairs
    strategies (Jaccard and containment). Precondition (checked by the
    callers' vocabulary probe): per-block distinct-token count ≤ 64.
    ``sum(1 << bit)`` equals the bitwise OR because ``_tok`` is
    distinct per document."""
    toks = base.select("_blk", F.col("_id"), F.explode("_tok").alias("_t"))
    dict_w = Window.partitionBy("_blk").orderBy("_t")
    vocab = (
        toks.select("_blk", "_t")
        .distinct()
        .withColumn("_bit", F.row_number().over(dict_w) - 1)
    )
    return (
        toks.join(vocab, ["_blk", "_t"])
        .groupBy("_blk", "_id")
        .agg(F.sum(F.expr("shiftleft(1L, _bit)")).alias("_mask"))
    )


def _max_block_vocab(base: DataFrame) -> int:
    """max over blocks of distinct-token count — the one tiny aggregate
    the bitmask-vs-prefix strategy decision needs."""
    return (
        base.select("_blk", F.explode("_tok").alias("_t"))
        .groupBy("_blk")
        .agg(F.count_distinct("_t").alias("v"))
        .agg(F.max("v"))
        .first()[0]
        or 0
    )


def _containment_bitmask_allpairs(
    base: DataFrame, tp: int, n_salt: int
) -> DataFrame:
    """Salted all-pairs directed containment over 64-bit token-set
    bitmasks (the containment twin of ``_jaccard_bitmask_allpairs``):
    |A∩B| = popcount(mask_a & mask_b) and |A| = popcount(mask_a) under
    any injective token→bit mapping, so both the integer permille gate
    and the emitted double are bit-identical to the array path while
    the pair compare is two longs — no token arrays cross the shuffle
    and no candidate/verify joins exist at all."""
    masks = _block_bitmasks(base)
    left = masks.select(
        "_blk",
        F.pmod(F.xxhash64("_id"), F.lit(n_salt)).alias("_salt"),
        F.col("_id").alias("id_a"),
        F.col("_mask").alias("mask_a"),
    ).repartition(n_salt, "_blk", "_salt")
    right = masks.select(
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
        F.col("_id").alias("id_b"),
        F.col("_mask").alias("mask_b"),
    )
    inter = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b"))).cast("long")
    na = F.bit_count(F.col("mask_a")).cast("long")
    return (
        left.join(right, ["_blk", "_salt"])
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.lit(1000) * inter >= F.lit(tp) * na)
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / na.cast("double")).alias("containment"),
        )
    )


def dedup_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-corpus exact LINE deduplication — the C4 rule family
    (Raffel et al., JMLR 2020 discard repeated three-sentence spans;
    RefinedWeb and MassiveText dedup repeated lines): every distinct
    non-empty line keeps only its FIRST occurrence in the corpus
    (ordered by ``(id, line position)``); all later occurrences —
    cross-document or repeats inside one document — are dropped, and
    each document's text is reassembled from its surviving lines.

    Returns one row per input document: ``(id, text, n_lines,
    n_dropped)`` where ``text`` is the kept lines joined by newline
    ('' when every line was dropped or the document had none),
    ``n_lines`` counts the original non-empty lines, and blank /
    whitespace-only lines are normalized away.

    Determinism: first-occurrence is a ``row_number`` over the
    line-keyed window ordered by ``(id, pos)`` — a pure function of
    corpus content, so an engine replay keeps the identical set.
    Scale: one line-keyed shuffle (the window — line-sized rows, the
    same key profile as a gram-postings aggregate) and one doc-keyed
    reassembly aggregate. Never doc×doc."""
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
        )
        .filter(F.trim(F.col("_line")) != "")
    )
    w = Window.partitionBy("_line").orderBy("_id", "_pos")
    kept = lines.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    stats = lines.groupBy("_id").agg(F.count("*").alias("n_lines"))
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
        F.count("*").alias("_n_kept"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(stats, "_id", "left")
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_text", F.lit("")).alias(text_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (
                F.coalesce("n_lines", F.lit(0))
                - F.coalesce("_n_kept", F.lit(0))
            ).alias("n_dropped"),
        )
    )


def containment_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_permille: int = 600,
    min_tokens: int = 1,
    strategy: str = "auto",
    salt: int | None = None,
) -> DataFrame:
    """Directed token-set CONTAINMENT pairs within a blocking key:
    every ordered (A, B) with ``C(A→B) = |A∩B| / |A| ≥ t`` — Broder's
    asymmetric companion to ``jaccard_pairs``. Subset duplication (a
    short document embedded verbatim inside a long one) scores low on
    symmetric Jaccard (|A∪B| is dominated by the big doc) but 1.0 on
    containment; it is how quote-farms and wrapper pages survive a
    Jaccard-only dedup pass.

    The threshold is a PERMILLE integer and the gate is the exact
    cross-multiplication ``1000·|A∩B| ≥ t‰·|A|`` — membership is
    engine- and partitioning-invariant; the emitted ``containment``
    double is one int/int IEEE division (bit-identical everywhere).

    Physical strategy: the one-sided prefix filter (the containment
    specialization of Bayardo et al. WWW'07). Per block, tokens order
    rarest-first by document frequency; the A side keeps only its
    first ``|A| − ⌈t·|A|⌉ + 1`` tokens (if C(A→B) ≥ t, B holds ≥
    ⌈t·|A|⌉ of A's tokens, so it must hold one of A's prefix — the
    join is LOSSLESS), the B side posts ALL tokens, candidates come
    from the (block, token) equi-join, and exact verification on the
    stored token arrays removes false candidates. No symmetric length
    filter exists here by design — a 5-token doc CAN be contained in a
    10⁶-token doc. Scale: candidate fan-out is Σ over A-prefix tokens
    of that token's posting length; rarest-first ordering makes those
    postings the SHORT ones under Zipf, the same argument (and the
    same shared ``_jaccard_base`` relation) as the Jaccard prefix
    path. The oracle for `containment_pairs_docs` is the NAIVE
    quadratic join, so every driver row re-proves the prefix filter's
    losslessness on real data.

    ``strategy='auto'`` mirrors ``jaccard_pairs``'s cost-based
    physical planning: when every block's distinct-token vocabulary
    fits in 64 symbols (the regime where prefix postings are fat and
    candidates approach n² anyway), token sets dictionary-encode into
    one 64-bit bitmask each and the salted all-pairs join compares
    popcounts — identical output (the popcount arithmetic IS the set
    arithmetic under the injective token→bit map), no candidate
    dedup or array-payload verify joins. ``'prefix'`` forces the
    prefix-filter join unconditionally."""
    if strategy not in ("auto", "prefix"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if not 1 <= threshold_permille <= 1000:
        raise ValueError("threshold_permille must be in [1, 1000]")
    tp = int(threshold_permille)
    base = (
        _jaccard_base(df, block_col, text_col, id_col)
        .filter(F.size("_tok") >= int(min_tokens))
        .persist()
    )
    if strategy == "auto":
        vocab_max = _max_block_vocab(base)
        if 0 < vocab_max <= 64:
            return _containment_bitmask_allpairs(
                base,
                tp,
                salt or df.sparkSession.sparkContext.defaultParallelism,
            )
    posts = base.select(
        "_blk", "_id", F.explode("_tok").alias("_t")
    )
    dfreq = posts.groupBy("_blk", "_t").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_blk", "_id").orderBy("_df", "_t")
    ranked = (
        posts.join(dfreq, ["_blk", "_t"])
        .withColumn("_rn", F.row_number().over(w))
        .join(
            base.select("_id", F.size("_tok").alias("_n")), "_id"
        )
    )
    # prefix length n − ⌈t‰·n⌉ + 1 in exact integer arithmetic
    prefix = ranked.filter(
        F.col("_rn")
        <= F.col("_n") - F.expr(f"(_n * {tp} + 999) DIV 1000") + F.lit(1)
    )
    cand = (
        prefix.select("_blk", "_t", F.col("_id").alias("id_a"))
        .join(
            posts.select("_blk", "_t", F.col("_id").alias("id_b")),
            ["_blk", "_t"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("tok_a", "tok_b")).cast("long")
    na = F.size("tok_a").cast("long")
    return (
        cand.join(
            base.select(F.col("_id").alias("id_a"), F.col("_tok").alias("tok_a")),
            "id_a",
        )
        .join(
            base.select(F.col("_id").alias("id_b"), F.col("_tok").alias("tok_b")),
            "id_b",
        )
        .filter(F.lit(1000) * inter >= F.lit(tp) * na)
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / na.cast("double")).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Group-level corpus overlap from MinHash signature unions
# ---------------------------------------------------------------------------

def default_overlap_hashes(n: int = 8) -> list:
    """The production xxhash64 hash family for group signatures —
    seed-indexed ``Column -> Column`` factories. The oracled query
    swaps in the md5-portable family; the incremental ingest twin
    (streaming/overlap_ingest.py) uses THIS family on both sides of
    its equivalence pin."""
    return [(lambda c, i=i: F.xxhash64(F.lit(i), c)) for i in range(n)]


def group_signatures(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 3,
    hash_fns: list | None = None,
) -> DataFrame:
    """Per-group MinHash signature over the UNION of the group's
    shingle sets: sig(∪ docs) is the elementwise MIN of shingle
    hashes, so the signature is one (group)-keyed MIN aggregate —
    groups × n_hashes values after map-side combine. Returns
    ``(g, _h0.._h{n-1})``. MIN is associative, commutative, and
    idempotent, which is what makes the signature incrementally
    maintainable (streaming/overlap_ingest.py merges per-batch
    signatures by elementwise MIN) and replay-safe."""
    if hash_fns is None:
        hash_fns = default_overlap_hashes()
    n = len(hash_fns)
    lowered = F.lower(F.col(text_col))
    dsh = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(word_shingles(lowered, shingle_k)).alias("s"),
        )
        .dropDuplicates(["g", "s"])
    )
    hashed = dsh.select(
        "g", *[hash_fns[i](F.col("s")).alias(f"_h{i}") for i in range(n)]
    )
    return hashed.groupBy("g").agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(n)]
    )


def signature_overlap_pairs(sig: DataFrame, n_hashes: int = 8) -> DataFrame:
    """Pairwise Jaccard estimates from per-group signatures:
    ``(g_a, g_b, est_matches, est_permille)`` for every unordered
    group pair, J(A, B) ≈ matching components / n_hashes. The pair
    spine is a bounded-metadata cross join over the group list. THE
    shared core of the batch audit (group_minhash_overlap) and the
    ingest-state twin (streaming/overlap_ingest.py:query_overlap) —
    one estimator, so the incremental path cannot drift from the
    oracled batch arithmetic."""
    sig_a = sig.select(
        F.col("g").alias("g_a"),
        *[F.col(f"_h{i}").alias(f"_ha{i}") for i in range(n_hashes)],
    )
    sig_b = sig.select(
        F.col("g").alias("g_b"),
        *[F.col(f"_h{i}").alias(f"_hb{i}") for i in range(n_hashes)],
    )
    est = None
    for i in range(n_hashes):
        term = (F.col(f"_ha{i}") == F.col(f"_hb{i}")).cast("long")
        est = term if est is None else est + term
    return (
        sig_a.crossJoin(F.broadcast(sig_b))
        .filter(F.col("g_a") < F.col("g_b"))
        .withColumn("est_matches", est)
        .withColumn(
            "est_permille", F.expr(f"(1000 * est_matches) DIV {n_hashes}")
        )
        .select("g_a", "g_b", "est_matches", "est_permille")
    )


def group_minhash_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 3,
    hash_fns: list | None = None,
    with_exact: bool = True,
) -> DataFrame:
    """Pairwise shingle-set overlap between GROUPS (sources,
    languages, snapshots) estimated from MinHash signature unions —
    the corpus-composition audit run before mixing sources: a MinHash
    signature of a UNION of sets is the elementwise MIN of the
    members' signatures (group_signatures), and
    J(A, B) ≈ matching components / n_hashes
    (signature_overlap_pairs — the shared estimator core).

    Returns one row per unordered group pair ``(g_a, g_b)`` with
    ``n_sh_a/n_sh_b`` (distinct shingles), ``est_matches`` /
    ``est_permille`` (the sketch estimate), and — when ``with_exact``
    — ``n_common`` / ``exact_permille``, the ground-truth Jaccard the
    estimate is audited against (the recall-query pattern).

    ``hash_fns`` is a list of ``Column -> Column`` hash factories; the
    default is the production xxhash64 family, the oracled query
    passes the md5-portable family. Scale: the estimate costs one
    shingle scan into a (group)-keyed MIN aggregate — map-side combine
    leaves groups × n_hashes rows, and the pair join is a
    bounded-metadata cross join over the group list. The exact twin is
    a shingle-keyed equi-join (the same profile the dedup family
    already pays) and is the part you drop at 100 TB — the estimate
    IS the scale path (and, being a pure MIN-merge, the part that
    stays incrementally maintainable at ingest —
    streaming/overlap_ingest.py).

    ``dsh`` is persisted: with the hash dictionary below it has FIVE
    consumers (dict distinct, signature probe, sizes, both exact-twin
    sides), and the shingle-string assembly they would each re-run is
    the dominant per-row cost. (An earlier 4-consumer probe rejected
    the persist at sf0.1, 5.27 s vs 4.38 s; the fifth consumer and
    hash-once-per-distinct-shingle flip that trade — re-measured
    via solo_probe this round.)"""
    if hash_fns is None:
        hash_fns = default_overlap_hashes()
    n = len(hash_fns)
    lowered = F.lower(F.col(text_col))
    dsh = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(word_shingles(lowered, shingle_k)).alias("s"),
        )
        .dropDuplicates(["g", "s"])
        .persist()
    )
    # Hash once per DISTINCT shingle, not per (group, shingle) row: the
    # hash family is a pure function of the shingle, and MIN per group
    # is invariant to where it is computed — same collapse-before-hash
    # algebra as the count-min/HLL builders. Matters for the md5-seeded
    # portable family (8 md5+hex chains per row; 7.6× fewer at sf0.1
    # where 207k (g, s) rows share 27k distinct shingles); the join
    # keys on ``s`` exactly like the exact-twin self-join below, so the
    # exchange is shared.
    sdict = dsh.select("s").distinct().select(
        "s", *[hash_fns[i](F.col("s")).alias(f"_h{i}") for i in range(n)]
    )
    # sig and sizes are BOUNDED relations (groups × n_hashes / groups
    # × 1) that each feed both sides of a self cross join below —
    # un-checkpointed, Catalyst plans the whole dict-hash+join+agg
    # subtree TWICE (the r10 before-plan shows two full sdict builds,
    # i.e. the 8-way md5 chains run twice per distinct shingle). Lazy
    # localCheckpoint: first consumer materializes, the rest scan rows.
    sig = (
        dsh.join(sdict, "s")
        .groupBy("g")
        .agg(*[F.min(f"_h{i}").alias(f"_h{i}") for i in range(n)])
        .localCheckpoint(eager=False)
    )
    est = signature_overlap_pairs(sig, n)
    sizes = (
        dsh.groupBy("g")
        .agg(F.count("*").cast("long").alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    out = (
        sizes.select(F.col("g").alias("g_a"), F.col("n_sh").alias("n_sh_a"))
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("g").alias("g_b"), F.col("n_sh").alias("n_sh_b")
                )
            )
        )
        .filter(F.col("g_a") < F.col("g_b"))
        .join(est, ["g_a", "g_b"])
    )
    if with_exact:
        a = dsh.select(F.col("g").alias("g_a"), "s")
        b = dsh.select(F.col("g").alias("g_b"), "s")
        common = (
            a.join(b, "s")
            .filter(F.col("g_a") < F.col("g_b"))
            .groupBy("g_a", "g_b")
            .agg(F.count("*").cast("long").alias("n_common"))
        )
        out = (
            out.join(common, ["g_a", "g_b"], "left")
            .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
            .withColumn(
                "exact_permille",
                F.expr(
                    "(1000 * n_common) DIV (n_sh_a + n_sh_b - n_common)"
                ),
            )
        )
        return out.select(
            "g_a", "g_b", "n_sh_a", "n_sh_b", "n_common",
            "exact_permille", "est_matches", "est_permille",
        )
    return out.select(
        "g_a", "g_b", "n_sh_a", "n_sh_b", "est_matches", "est_permille"
    )
