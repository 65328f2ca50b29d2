"""Deterministic sampling and dataset splitting.

Training-data pipelines need reproducible row selection that is a pure
function of content — stable across runs, engines, partitionings, and
cluster sizes (seeded ``rand()`` is none of those across engines):

- ``hash_bucket``: 0..255 bucket from the md5 of a key column, built
  from hex-digit arithmetic expressible identically in any SQL engine
  (so oracle checks are exact).
- ``dataset_split``: train/val/test assignment by bucket thresholds —
  the standard contamination-safe split (a document's split never
  changes when the corpus grows, unlike percentile- or rand-based
  splits).
- ``hash_sample``: keep a deterministic ~p fraction by bucket range.
- ``stratified_sample``: per-stratum exact-ish fractions via
  ``sampleBy`` (seeded; Spark-deterministic, engine-specific).

Scale: all map-only (no shuffle); the bucket expression pushes through
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hexval(c: Column) -> Column:
    """Value 0-15 of one lowercase hex character — via position in the
    hex alphabet, an expression any engine evaluates identically."""
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def hash_bucket(
    key: str | Column, buckets: int = 256, salt: str | None = None
) -> Column:
    """Stable bucket 0..buckets-1 from md5(salt + key) —
    content-addressed, partition- and engine-independent. Uses the
    first two hex digits (256 base buckets); ``buckets`` must divide
    256.

    ``salt`` decorrelates INDEPENDENT uses of the coin: two sampling
    passes keyed on the same column with the same digest select the
    same hash-prefix region, so composing them (e.g. balanced_sample
    then dataset_split) silently concentrates survivors in one pass's
    low buckets — found by the curation demo, where every
    post-rebalance document landed in the train split. Unsalted
    (None) is the canonical SPLIT identity digest; every other
    operator passes its own prefix."""
    assert 256 % buckets == 0, "buckets must divide 256"
    c = F.col(key) if isinstance(key, str) else key
    c = c.cast("string")
    if salt is not None:
        c = F.concat(F.lit(salt), c)
    h = F.md5(c)
    v256 = _hexval(F.substring(h, 1, 1)) * 16 + _hexval(F.substring(h, 2, 1))
    return (v256 / (256 // buckets)).cast("int")


def dataset_split(
    df: DataFrame,
    key_col: str,
    train_buckets: int = 204,  # 204/256 ≈ 79.7 %
    val_buckets: int = 26,     # 26/256  ≈ 10.2 %
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket of ``key_col``.

    Null keys go to TRAIN explicitly: a null bucket makes every
    ``when`` condition null-false, so the naive form routed key-less
    rows into the ``otherwise`` branch — silently polluting the
    held-out test set with rows that have no stable identity. Train is
    the safe destination (eval purity matters; training mix doesn't).
    """
    b = hash_bucket(key_col)
    return df.withColumn(
        split_col,
        F.when(b.isNull() | (b < train_buckets), "train")
        .when(b < train_buckets + val_buckets, "val")
        .otherwise("test"),
    )


def hash_sample(df: DataFrame, key_col: str, fraction_256: int) -> DataFrame:
    """Deterministic ~(fraction_256/256) sample by content hash
    ('s|'-salted — see hash_bucket: an unsalted sample pass would be
    correlated with dataset_split's buckets)."""
    return df.filter(hash_bucket(key_col, salt="s|") < fraction_256)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling via ``sampleBy`` (seeded, Spark-side)."""
    return df.sampleBy(strata_col, fractions, seed)


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
) -> DataFrame:
    """Deterministically downsample every stratum to (approximately)
    the smallest stratum's size — the hash-threshold version of
    uniform domain rebalancing (the action behind
    plans/pipeline_queries.py:source_mix_weights).

    Per stratum the keep fraction is ``min_count / n_s``; a row is
    kept iff its content-hash bucket satisfies ``b < frac * 256``, so
    membership is a pure function of (content, corpus composition):
    reproducible across engines and partitionings, and rerunning after
    corpus growth only moves rows whose stratum fraction changed.
    One count aggregate + a broadcast join of |strata| rows — the data
    itself is scanned once, map-only.

    A NULL stratum is a stratum: groupBy already counts it, and the
    join back is null-safe — a plain equi-join would silently DROP
    every null-stratum row from the output while their count still
    participated in (and could even define) the min-size target.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_min"))
    frac = counts.crossJoin(F.broadcast(min_n)).select(
        F.col(stratum_col).alias("_stratum"),
        (F.col("_min") / F.col("_n")).alias("_frac"),
    )
    return (
        df.join(
            F.broadcast(frac), df[stratum_col].eqNullSafe(frac["_stratum"])
        )
        # 'b|' salt: an unsalted threshold would correlate with
        # dataset_split (see hash_bucket) — rebalance-then-split
        # emptied the val/test buckets before r5
        .filter(hash_bucket(key_col, salt="b|") < F.col("_frac") * 256)
        .select(*df.columns)
    )


def hash_uniform(key: str | Column, salt: str = "u|") -> Column:
    """Deterministic uniform in [0, 1) from md5('u|' + key): the first
    12 hex digits as a 48-bit integer over 16^12 — fine enough for
    per-row Bernoulli thresholds (2⁻⁴⁸ resolution), exactly
    representable in a double (48 < 53 mantissa bits), and built from
    the same hex-digit arithmetic as ``hash_bucket`` so any engine
    evaluates it identically.

    The ``'u|'`` salt is load-bearing: an unsalted md5 shares its
    digest with ``hash_bucket``/``dataset_split``, making the sampling
    coin CORRELATED with split assignment — a weighted_sample pass
    then silently empties the val/test buckets (every survivor has a
    small hash prefix, hence a small bucket). Found by the curation
    demo: 69/69 post-sampling docs landed in train.

    ``salt`` (default the canonical ``'u|'``) decorrelates
    INDEPENDENT uses of the uniform — e.g. the Gumbel coin in
    ``dsir_gumbel_topk`` must not be the coin ``weighted_sample``
    already spent on the same key."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    v = F.lit(0).cast("long")
    for j in range(12):
        v = v + _hexval(F.substring(h, j + 1, 1)).cast("long") * (16 ** (11 - j))
    return v.cast("double") / F.lit(float(16**12))


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    key_col: str,
) -> DataFrame:
    """Per-row deterministic Bernoulli sampling: keep a row iff
    ``hash_uniform(key) < weight`` (weights in [0, 1]; ≥1 always
    keeps, ≤0 never). The content-hash coin makes membership a pure
    function of (key, weight) — stable across runs, engines, and
    partitionings, unlike seeded ``rand()`` — which is what lets a
    quality-weighted corpus re-sample reproducibly as weights evolve:
    a row's fate changes only if ITS weight crossed its coin.

    Map-only (no shuffle); the hash arithmetic is whole-stage
    codegen'd. At 100 TB this is the standard quality-proportional
    downsampling pass (e.g. sampling web text ∝ LM quality score)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(hash_uniform(key_col) < w)


def _dsir_feature_buckets(
    df: DataFrame, text_col: str, id_col: str, num_buckets: int
) -> DataFrame:
    """One row per hashed-n-gram feature OCCURRENCE: lowercased
    whitespace unigrams + bigrams, md5-hashed ('d|' salt) into
    ``num_buckets`` buckets. Occurrence-level (not distinct) because
    DSIR's bag-of-hashed-ngrams likelihood counts multiplicity.

    Built on the codegen posexplode+lead machinery (the winnow/
    duplicated_spans pattern), NOT array higher-order functions: HOF
    lambdas run interpreted, and the testdata parquet is one row
    group, so an array-built featurize md5-hashed every gram of the
    corpus on a single task (measured 17 s at sf0.1 — 8× the corpus
    scan). The doc-keyed window shuffle both restores codegen and
    spreads the per-gram md5 across cores; the bigram is a lead(1)
    concat over the empty-filtered token sequence, identical to
    pairing the filtered token list."""
    from pyspark.sql import Window as W

    toks = F.split(F.trim(F.lower(F.col(text_col))), "[ \t\n\r\f]+")
    base = df.select(
        F.col(id_col).alias("_doc"), F.posexplode(toks).alias("_pos", "_t")
    ).filter(F.col("_t") != "")
    w = W.partitionBy("_doc").orderBy("_pos")
    with_bi = base.withColumn(
        "_bi", F.concat(F.col("_t"), F.lit(" "), F.lead("_t").over(w))
    )
    return (
        with_bi.select(
            "_doc", F.explode(F.array(F.col("_t"), F.col("_bi"))).alias("_gram")
        )
        .filter(F.col("_gram").isNotNull())
        .select(
            "_doc",
            hash_bucket(F.col("_gram"), num_buckets, salt="d|").alias("bkt"),
        )
    )


def dsir_log_ratio(
    r_cnt: DataFrame, t_cnt: DataFrame, num_buckets: int
) -> DataFrame:
    """The scaled-BIGINT smoothed log-ratio table from two bucket-count
    relations ``(bkt, rc)`` / ``(bkt, tc)``: one row per raw-side
    bucket, ``_lr_i = round(ln(p_target/p_raw)·1e9)`` with add-one
    smoothing over ``num_buckets``. Shared by the batch operator and
    the ingest-time index (streaming/dsir_ingest.py) so both score
    with literally the same expression."""
    r_tot = r_cnt.groupBy().agg(F.sum("rc").alias("rtot"))
    t_tot = t_cnt.groupBy().agg(F.sum("tc").alias("ttot"))
    return (
        r_cnt.join(t_cnt, "bkt", "left")
        .crossJoin(F.broadcast(r_tot))
        .crossJoin(F.broadcast(t_tot))
        .withColumn(
            "_lr_i",
            F.expr(
                "CAST(ROUND(LN("
                "((CAST(COALESCE(tc, 0) AS DOUBLE) + 1.0)"
                f" / (CAST(ttot AS DOUBLE) + {float(num_buckets)!r}))"
                " / ((CAST(rc AS DOUBLE) + 1.0)"
                f" / (CAST(rtot AS DOUBLE) + {float(num_buckets)!r}))"
                ") * 1e9) AS BIGINT)"
            ),
        )
        .select("bkt", "_lr_i")
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every ``raw`` document by how much more likely its hashed-n-gram
    bag is under the ``target`` corpus's bucket distribution than
    under ``raw``'s own, ``log w(x) = Σ_f log(p_target(b_f) /
    p_raw(b_f))`` over feature occurrences ``f`` — the standard
    cheap proxy for "select pretraining text that looks like the
    high-quality target domain".

    Model: unigram+bigram features hashed into ``num_buckets`` md5
    buckets; each side's bucket distribution is add-one smoothed,
    ``p(b) = (c(b)+1) / (total+B)``. Returns ``(id, n_feats,
    log_weight)`` for every raw document with ≥1 token.

    Engine portability: the per-bucket log ratio is rounded to 9 dp
    and scaled to BIGINT; per-doc sums are integer sums (the
    bm25/unigram-LM playbook), so aggregation order can never flip a
    hash. Plan shape: two bucket-count aggregates (≤``num_buckets``
    groups each, map-side combined), their join broadcast back onto
    the exploded raw features, one doc-keyed integer-sum aggregate.
    At 100 TB both distributions are bucket-sized (256 rows) and the
    scoring join is a broadcast; the corpus-sized shuffle is the
    doc-keyed featurize window, whose partitioning the downstream
    per-doc sum reuses.
    """
    r_b = _dsir_feature_buckets(raw, text_col, id_col, num_buckets)
    t_b = _dsir_feature_buckets(target, text_col, id_col, num_buckets)
    r_cnt = r_b.groupBy("bkt").agg(F.count("*").alias("rc"))
    t_cnt = t_b.groupBy("bkt").agg(F.count("*").alias("tc"))
    lr = dsir_log_ratio(r_cnt, t_cnt, num_buckets)
    return (
        r_b.join(F.broadcast(lr), "bkt")
        .groupBy("_doc")
        .agg(F.count("*").alias("n_feats"), F.sum("_lr_i").alias("_sum"))
        .select(
            F.col("_doc").alias(id_col),
            "n_feats",
            (F.col("_sum").cast("double") / F.lit(1e9)).alias("log_weight"),
        )
    )


def dsir_gumbel_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "log_weight",
) -> DataFrame:
    """Deterministic Gumbel-top-k resampling over DSIR log-weights:
    sampling k documents WITHOUT replacement ∝ w(x) is exactly
    taking the top k of ``log w(x) + Gumbel(0,1)`` (the Gumbel-max
    trick); the Gumbel draw is the content-hash uniform
    (``hash_uniform``, 'g|' salt — decorrelated from the
    ``weighted_sample`` coin) pushed through ``-ln(-ln(u))``, so the
    selected set is a pure function of content, stable across runs
    and engines.

    Integer-exact ordering: both the log-weight and the Gumbel are
    scaled-9dp BIGINTs; the sort key is their integer sum, ties
    broken by id. Top-k is ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-partition heaps then a k-row merge,
    never a global sort; the k-row rank window is bounded by k."""
    u = F.greatest(hash_uniform(id_col, salt="g|"), F.lit(1e-12))
    scored = (
        weights.withColumn("_u", u)
        .withColumn(
            "_score_i",
            F.expr(f"CAST(ROUND({logw_col} * 1e9) AS BIGINT)")
            + F.expr("CAST(ROUND(-LN(-LN(_u)) * 1e9) AS BIGINT)"),
        )
        .orderBy(F.col("_score_i").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_score_i").desc(), F.col(id_col).asc())
    return scored.select(
        F.row_number().over(w).cast("int").alias("rank"),
        id_col,
        (F.col("_score_i").cast("double") / F.lit(1e9)).alias("score"),
    )


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    rate_col: str = "rate",
) -> DataFrame:
    """Per-stratum α-temperature sampling rates (the multilingual
    data-mixing recipe of Conneau & Lample, NeurIPS 2019, and XLM-R:
    sample strata ∝ p_s^α so low-resource strata are up-weighted
    without drowning the head): with ``q_s = p_s^α / Σ_t p_t^α``, the
    per-row keep rate is ``min(1, budget_frac · N · q_s / n_s)``,
    i.e. the corpus shrinks to ~``budget_frac·N`` rows distributed by
    the temperature-flattened mixture. α=1 keeps the natural mix,
    α→0 approaches uniform-per-stratum.

    Engine portability: the only cross-row float reduction — Σ p^α —
    accumulates the per-stratum ``ROUND(p^α·1e9)`` as BIGINT (the
    scaled-sum playbook), and the emitted rate is rounded to 6 dp, so
    both the rate column and every downstream coin comparison are
    digit-identical on any engine and partitioning. Two |strata|-row
    aggregates plus broadcast 1-row totals — nothing corpus-sized."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(F.sum("_n").cast("long").alias("_total"))
    powed = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_pow_i",
        F.expr(
            "CAST(ROUND(POWER(CAST(_n AS DOUBLE) / CAST(_total AS DOUBLE),"
            f" {float(alpha)!r}) * 1e9) AS BIGINT)"
        ),
    )
    s = powed.agg(F.sum("_pow_i").cast("long").alias("_sum_i"))
    return (
        powed.crossJoin(F.broadcast(s))
        .withColumn(
            rate_col,
            F.expr(
                f"ROUND(LEAST(1.0, {float(budget_frac)!r}"
                " * CAST(_total AS DOUBLE)"
                " * (CAST(_pow_i AS DOUBLE) / CAST(_sum_i AS DOUBLE))"
                " / CAST(_n AS DOUBLE)), 6)"
            ),
        )
        .select(stratum_col, F.col("_n").alias("n_rows"), rate_col)
    )


def temperature_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    rate_col: str = "rate",
) -> DataFrame:
    """Apply ``temperature_rates`` as a deterministic Bernoulli pass:
    keep a row iff its 't|'-salted content-hash uniform is below its
    stratum's rate (purpose-salted — see hash_uniform; the split/
    sample/balance coins must stay independent). The rates relation
    is |strata| rows, broadcast; the join is null-safe so a NULL
    stratum samples at its own rate instead of vanishing (the
    balanced_sample lesson). Map-only over the corpus."""
    # the bloom.py r4 lesson: a joined-on output column that collides
    # with a caller column is an ambiguity error or a silent overwrite
    assert rate_col not in df.columns, (
        f"temperature_sample: column {rate_col!r} already exists; "
        "pass a different rate_col"
    )
    rates = temperature_rates(
        df, stratum_col, alpha=alpha, budget_frac=budget_frac, rate_col=rate_col
    ).select(F.col(stratum_col).alias("_stratum"), rate_col)
    return (
        df.join(
            F.broadcast(rates), df[stratum_col].eqNullSafe(rates["_stratum"])
        )
        .filter(hash_uniform(key_col, salt="t|") < F.col(rate_col))
        .select(*df.columns, rate_col)
    )


def epoch_mix_plan(
    df: DataFrame,
    tokens_per_source: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    budgets: DataFrame | None = None,
) -> DataFrame:
    """Per-document repeat counts that hit a per-source token budget.

    The data-recipe "epoching" step (DoReMi / Pile-style mixes,
    public recipes): each source contributes its budget of whitespace
    tokens to the training mix — either the same scalar
    ``tokens_per_source`` for every source, or a per-source
    ``budgets`` relation ``(source, budget_tokens)`` (what
    ``unimax_plan`` emits: total budget → per-source allocations →
    this operator turns each allocation into repeat counts). Exactly
    one of the two must be given; a source absent from ``budgets``
    gets budget 0. Whole epochs repeat every document ``budget DIV
    source_tokens`` times; the remainder (``budget % source_tokens``)
    is filled by ONE extra pass over a deterministic hash-ordered
    prefix of the source's documents — documents whose cumulative
    token count starts strictly inside the remainder get one extra
    repeat (greedy prefix, so the remainder overshoots by at most one
    document rather than undershooting).

    Everything is exact integer arithmetic on a per-source window
    cumsum (the sequence_packing shape: one shuffle per source key,
    sources pack independently across executors), so repeat counts are
    partition- and engine-invariant; the ``budgets`` join is a
    broadcast of the source-count-sized relation onto that same
    shuffle. Output: id, source, n_tokens, repeat_count.

    A source with zero tokens (possible only if every document is
    empty) yields repeat_count 0 — a DIV-by-zero guard, not a real
    mix decision.
    """
    from pyspark.sql import Window

    from .packing import engine_safe_tokens

    if (tokens_per_source is None) == (budgets is None):
        raise ValueError(
            "pass exactly one of tokens_per_source or budgets"
        )
    # greatest(size, 0): size() of a NULL token array is -1 (legacy)
    # or NULL (ANSI) — either corrupts the budget arithmetic; a
    # null-text document is 0 tokens
    toks = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.greatest(
            F.size(engine_safe_tokens(text_col)).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    if budgets is not None:
        # budgets are SUMMED per source before the join: a duplicate
        # source row would otherwise fan out every document of that
        # source (token grants are additive; a fan-out is never right)
        toks = toks.join(
            F.broadcast(
                budgets.groupBy("source").agg(
                    F.sum(F.col("budget_tokens").cast("long")).alias(
                        "_budget"
                    )
                )
            ),
            "source",
            "left",
        ).withColumn(
            "_budget", F.coalesce(F.col("_budget"), F.lit(0).cast("long"))
        )
    else:
        toks = toks.withColumn(
            "_budget", F.lit(int(tokens_per_source)).cast("long")
        )
    w_tot = Window.partitionBy("source")
    # hash-ordered cumulative tokens BEFORE each doc ('e|'-salted coin:
    # an unsalted order would correlate with dataset_split's identity)
    order = Window.partitionBy("source").orderBy(
        hash_bucket(F.col(id_col).cast("string"), salt="e|"),
        F.col(id_col),
    )
    cum = (
        F.sum("n_tokens").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("n_tokens")
    )
    staged = toks.select(
        id_col,
        "source",
        "n_tokens",
        "_budget",
        F.sum("n_tokens").over(w_tot).alias("_src_tokens"),
        cum.alias("_cum_before"),
    )
    # DIV/% keep the epoch arithmetic in exact integers — a double
    # division + floor can land one off when the true quotient sits
    # next to an integer.
    whole = F.expr(
        "CASE WHEN _src_tokens > 0 THEN _budget DIV _src_tokens "
        "ELSE CAST(0 AS BIGINT) END"
    )
    rem = F.expr(
        "CASE WHEN _src_tokens > 0 THEN _budget % _src_tokens "
        "ELSE CAST(0 AS BIGINT) END"
    )
    extra = (F.col("_cum_before") < rem).cast("long")
    return staged.select(
        id_col,
        "source",
        "n_tokens",
        (whole + extra).alias("repeat_count"),
    )

def unimax_plan(
    df: DataFrame,
    total_budget: int,
    max_epochs: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023): split a
    TOTAL token budget across sources as uniformly as possible,
    capping every source at ``max_epochs`` passes over its own data —
    the repeat-cap companion to ``epoch_mix_plan`` (which takes the
    per-source budget as given; this operator decides it).

    Closed form instead of the paper's sequential loop: sort sources
    ascending by cap ``c_i = max_epochs·s_i`` (tie by name). With
    ``P_k`` the ascending cap prefix sum, ``f(k) = P_{k-1} +
    c_k·(n-k+1)`` is nondecreasing (difference ``(n-k)(c_{k+1}-c_k) ≥
    0``), so the capped sources are exactly the prefix ``f(k) ≤ B``:
    each of those takes its full cap, and the remainder ``R = B - P_m``
    splits evenly over the ``u = n-m`` uncapped sources — ``R DIV u``
    each, the first ``R % u`` (ascending) getting one extra token. The
    smallest uncapped cap satisfies ``c_{m+1}·u > R``, hence ``c_{m+1}
    ≥ R DIV u + 1``: equal shares never breach a cap. Everything is
    exact BIGINT arithmetic (prefix sums, DIV, %), so the plan is
    partition- and engine-invariant; ``sum(alloc) = min(B, Σc_i)``.

    Scale shape: one corpus-keyed hash aggregate (tokens per source,
    map-side combine) reduces the input to a SOURCE-COUNT-sized
    relation; the ordered windows after it are bounded by the number
    of sources (tens to thousands in any real mix), the same
    bounded-single-reducer trade as ``lm_quality_buckets`` documents
    per language. Output: ``(source, source_tokens, cap_tokens,
    alloc_tokens, capped)``.
    """
    from pyspark.sql import Window

    from .packing import engine_safe_tokens

    if total_budget < 0 or max_epochs < 0:
        raise ValueError("total_budget and max_epochs must be >= 0")
    b = int(total_budget)
    src = (
        df.select(
            F.col(source_col).alias("source"),
            # greatest(size, 0): null-text docs are 0 tokens, never -1
            F.greatest(
                F.size(engine_safe_tokens(text_col)).cast("long"), F.lit(0)
            ).alias("_nt"),
        )
        .groupBy("source")
        .agg(F.sum("_nt").alias("source_tokens"))
        .withColumn(
            "cap_tokens",
            (F.col("source_tokens") * F.lit(int(max_epochs))).cast("long"),
        )
    )
    # bounded relation from here: one row per source
    w_ord = Window.orderBy(F.asc("cap_tokens"), F.asc("source"))
    w_all = Window.partitionBy()
    staged = src.select(
        "source",
        "source_tokens",
        "cap_tokens",
        F.row_number().over(w_ord).alias("_k"),
        (
            F.sum("cap_tokens").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("cap_tokens")
        ).alias("_p_before"),
        F.count("*").over(w_all).alias("_n"),
    ).withColumn(
        "capped",
        F.col("_p_before")
        + F.col("cap_tokens") * (F.col("_n") - F.col("_k") + 1)
        <= F.lit(b),
    )
    totals = staged.withColumn(
        "_m", F.sum(F.col("capped").cast("long")).over(w_all)
    ).withColumn(
        "_p_m",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))).over(w_all),
            F.lit(0).cast("long"),
        ),
    )
    share = F.expr("CASE WHEN _n > _m THEN (%d - _p_m) DIV (_n - _m) ELSE 0 END" % b)
    extra_cut = F.expr("CASE WHEN _n > _m THEN (%d - _p_m) %% (_n - _m) ELSE 0 END" % b)
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        share + ((F.col("_k") - F.col("_m")) <= extra_cut).cast("long")
    )
    return totals.select(
        "source",
        "source_tokens",
        "cap_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        "capped",
    )


def group_cap_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "c|",
    bucket_hex_digits: int = 4,
) -> DataFrame:
    """Per-group quota: keep AT MOST ``cap`` rows per ``group_col``,
    chosen deterministically by content hash — the RefinedWeb-style
    per-domain cap (Penedo et al. 2023 §3.1 limit documents per
    registrable domain so link-farms and mirror hosts cannot dominate
    the corpus). Membership is a pure function of (id, group, corpus
    composition): re-runs and engines agree, and growing OTHER groups
    never changes this group's survivors.

    Semantics (what the oracle pins): keep the ``cap`` smallest rows
    per group by ``(md5(salt||id), id)`` — exactly
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5, id) <= cap``.

    Scale design — NO group-sized rank window. A hot domain at 100 TB
    can hold 10⁹ documents; ranking it in one window partition is the
    single-reducer trap. Instead the hash's leading
    ``bucket_hex_digits`` hex chars (lowercase hex: lexicographic ==
    numeric order, and a prefix ordering of the full digest) bucket
    each group into ≤ 16^digits cells:

    1. per-(group, bucket) counts — shuffle bounded by groups × cells,
       not rows;
    2. cumulative counts over the bounded cell relation find each
       group's THRESHOLD bucket t (first bucket where cum ≥ cap) and
       the remainder r = cap − cum(<t);
    3. rows below t keep outright (map-side after the threshold
       join); rows beyond t drop outright; ONLY the threshold bucket
       — in expectation group_size/16^digits rows — pays a rank
       window for its r smallest.

    The threshold relation holds one row per OVER-CAP group. Its join
    strategy is deliberately left to the optimizer (no ``broadcast``
    hint): with the ~10⁷-10⁸ registrable domains this operator
    targets, a forced broadcast could exceed the driver/executor
    broadcast limits and fail outright, while AQE broadcasts it for
    free whenever the over-cap set is actually small (the common
    case — most domains sit under the cap).

    Groups smaller than ``cap`` have no threshold bucket and keep
    everything. ``id_col`` must be non-null and unique (it is the tie
    break making the selection total).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    if not 1 <= bucket_hex_digits <= 8:
        raise ValueError("bucket_hex_digits must be in [1, 8]")
    from pyspark.sql import Window

    cols = df.columns
    d = df.withColumn(
        "_h", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    ).withColumn("_b", F.substring("_h", 1, int(bucket_hex_digits)))

    cells = d.groupBy(group_col, "_b").agg(F.count("*").alias("_n"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("_cum", F.sum("_n").over(w_cum))
    # threshold bucket: first cell where the running count reaches cap;
    # remainder = cap - (running count strictly before it)
    thr = (
        cum.filter(F.col("_cum") >= cap)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(group_col).orderBy("_b")),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col(group_col).alias("_tg"),
            F.col("_b").alias("_tb"),
            (F.lit(cap) - (F.col("_cum") - F.col("_n"))).alias("_r"),
        )
    )
    j = d.join(thr, d[group_col].eqNullSafe(thr["_tg"]), "left")
    below = j.filter(F.col("_tb").isNull() | (F.col("_b") < F.col("_tb")))
    at = j.filter(F.col("_b") == F.col("_tb"))
    w_at = Window.partitionBy(group_col).orderBy("_h", id_col)
    at_kept = at.withColumn("_arn", F.row_number().over(w_at)).filter(
        F.col("_arn") <= F.col("_r")
    )
    return below.select(*cols).unionByName(at_kept.select(*cols))
