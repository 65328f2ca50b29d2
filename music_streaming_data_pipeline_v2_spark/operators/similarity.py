"""Similarity search over embedding columns (``array<float>``).

Extension surface (SURVEY.md §7 phase 6). Two strategies:

- ``cosine_topk``: brute-force exact top-K — broadcast the (small)
  query set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python), rank per query with a window.
  The correctness baseline; also the right plan whenever |queries| is
  small: one scan of the corpus, no shuffle of vectors, only the
  (|queries| × K) result shuffles.
- ``lsh_topk``: random-hyperplane LSH — sign-bit signatures bucket the
  corpus; candidates = rows sharing a band bucket with the query;
  exact cosine re-ranks candidates. Sub-linear candidate sets at the
  cost of recall; the scale path when |queries| is large. Hyperplanes
  are generated from a seeded RNG on the driver (tiny: dims × bits
  floats) and inlined as literals — deterministic across runs.
- ``ivf_topk``: IVF-style two-stage search — a k-means-lite codebook
  (seeded sample, one refinement pass) assigns each vector to its
  nearest centroid at write time; queries probe the ``nprobe`` nearest
  centroids only. The partition-pruning analog for vector search.

Scale notes: embeddings tables partition by bucket/centroid id so a
query's candidate fetch prunes partitions; signatures and centroid
assignments are computed once at ingest, not per query.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — zip_with + aggregate, sequential fold (stable
    summation order ⇒ deterministic across engines and runs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def dot_sql(a: str, b: str, dims: int) -> str:
    """Σ aᵢ·bᵢ as an explicit ``dims``-term SQL sum over two array
    columns named ``a``/``b``.

    Numerically IDENTICAL to ``_dot``'s fold: both are left-associated
    sequential additions and IEEE ``0.0 + x == x``, so swapping one for
    the other can never flip a threshold comparison. The point is the
    execution tier: higher-order lambdas (zip_with/aggregate) are
    INTERPRETED per row — on an O(Σ cluster²) pair join that's the
    whole runtime — while a flat arithmetic expression whole-stage-
    codegens (measured on semantic_dedup at sf0.1: 8.2 s → the join
    cost disappears). Assembled as a SQL string, not nested Columns:
    64-term Column trees pay >1 s of py4j plan-build per query.

    NOT width-guarded: under Spark 4's default ANSI mode, indexing a
    vector shorter than ``dims`` throws INVALID_ARRAY_INDEX — callers
    must ensure ragged rows never reach this expression (semantic_dedup
    does it via ``norm_sql``'s NULL norm short-circuiting the CASE the
    dot sits in; see pair_cos there). Wrapping every term set in its
    own CASE here blew the generated processNext() past the JVM's
    64 KB method limit and silently dropped the whole stage to
    interpreted eval (ADVICE-r4 follow-up) — guard once per row at
    the use site instead."""
    return " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
        for i in range(dims)
    )


def norm_sql(a: str, dims: int) -> str:
    """√Σ aᵢ² with the same left-associated order as ``_norm``.
    Width-guarded (ONE SIZE() branch around the whole sum — cheap,
    unlike per-centroid guards, see dot_sql): a ragged vector gets a
    NULL norm, not an ANSI INVALID_ARRAY_INDEX crash (ADVICE r4), the
    same "no direction" contract zero-norm vectors already get."""
    body = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE))"
        for i in range(dims)
    )
    return f"CASE WHEN SIZE({a}) = {dims} THEN SQRT({body}) END"


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, null for zero-norm inputs: an unguarded
    division crashes the whole job under Spark 4's default ANSI mode
    the moment ANY corpus vector is all-zero (DIVIDE_BY_ZERO), and a
    zero-norm vector has no defined direction anyway. Null ranks last
    under desc ordering and fails every >= threshold filter, so
    degenerate vectors drop out of top-k/near-dup results instead of
    aborting them. (The DuckDB oracle twin never sees the branch —
    the driver testdata has no zero vectors.)"""
    denom = _norm(a) * _norm(b)
    return F.when(denom != F.lit(0.0), _dot(a, b) / denom)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-K per query.

    ``queries``: (query_id, embedding). Broadcast-joined against the
    corpus → one corpus scan regardless of |queries|; ranking window
    partitions by query so the sort is per-query top-K.

    ``dims``: when the embedding width is known, scoring — the
    O(|corpus|·|queries|) hot path — runs as a flat ``dims``-term
    codegen sum (`dot_sql`) with per-row norms precomputed map-side
    (once per vector, not per pair), instead of the interpreted
    higher-order fold; same summation order, same values (see
    dot_sql). Omit for width-agnostic (slow-path) use — the
    semantic_dedup convention.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    if dims is not None:
        q = q.withColumn("_qn", F.expr(norm_sql("_qvec", dims)))
        c = c.withColumn("_cn", F.expr(norm_sql("_cvec", dims)))
        pair_cos = F.when(
            (F.col("_qn") * F.col("_cn")) != F.lit(0.0),
            F.expr(dot_sql("_qvec", "_cvec", dims))
            / (F.col("_qn") * F.col("_cn")),
        )
    else:
        pair_cos = cosine(F.col("_qvec"), F.col("_cvec"))
    scored = c.join(F.broadcast(q), how="cross")
    scored = scored.withColumn("cosine", pair_cos).filter(
        F.col("cosine").isNotNull()
    )  # zero-norm rows are unrankable
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def random_hyperplanes(dims: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (driver-side, tiny, deterministic)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dims)] for _ in range(bits)]


def hyperplane_signature(
    vec: Column, planes: list[list[float]], bands: int
) -> Column:
    """Array of ``bands`` bucket ids; each band hashes ``bits/bands``
    sign bits of the projections."""
    bits = len(planes)
    per_band = bits // bands
    sign_bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            1,
        ).otherwise(0)
        for plane in planes
    ]
    bands_out = []
    for b in range(bands):
        acc = F.lit(0)
        for i in range(per_band):
            acc = acc * 2 + sign_bits[b * per_band + i]
        bands_out.append(acc)
    return F.array(*bands_out)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-K: hyperplane-LSH candidate generation + exact
    cosine re-rank. Returns the same schema as ``cosine_topk`` (a query
    may return < k rows if its buckets are sparse)."""
    if bits % bands != 0:
        raise ValueError(f"bits ({bits}) must divide evenly into {bands} bands")
    # dims mismatch would not crash — zip_with pads with nulls, every
    # sign bit falls to 0, and ALL rows share one bucket: silently
    # worse-than-brute-force. Probe one row and refuse instead.
    probe = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is not None and probe["d"] != dims:
        raise ValueError(
            f"dims={dims} but {vec_col} vectors have {probe['d']} elements"
        )
    planes = random_hyperplanes(dims, bits, seed)

    # widths are probe-validated == dims above, so the flat codegen
    # scorer is always safe here; norms are computed once per vector
    # (below the band explode), never per candidate pair (see dot_sql
    # for the numerical-identity argument)
    c_sig = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.expr(norm_sql(vec_col, dims)).alias("_cn"),
        F.posexplode(hyperplane_signature(F.col(vec_col), planes, bands)).alias(
            "band_id", "bucket"
        ),
    )
    q_sig = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.expr(norm_sql(vec_col, dims)).alias("_qn"),
        F.posexplode(hyperplane_signature(F.col(vec_col), planes, bands)).alias(
            "band_id", "bucket"
        ),
    )
    cand = (
        c_sig.join(F.broadcast(q_sig), ["band_id", "bucket"])
        .select("query_id", "neighbor_id", "_qvec", "_cvec", "_qn", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.when(
            (F.col("_qn") * F.col("_cn")) != F.lit(0.0),
            F.expr(dot_sql("_qvec", "_cvec", dims))
            / (F.col("_qn") * F.col("_cn")),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def kmeans_lite(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> list[list[float]]:
    """One-pass k-means: seed centroids from a deterministic sample,
    refine once by mean of assigned vectors. Driver holds only
    (n_centroids × dims) floats — the corpus is never collected."""
    seeds = [
        r["v"]
        for r in corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.xxhash64(F.col("i"), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    ]
    if not seeds:
        raise ValueError("kmeans_lite: empty corpus — nothing to seed from")
    dims = len(seeds[0])
    # a stray different-width vector would null one component of
    # sum_vec and crash the driver-side division with a bare TypeError
    # mid-job; exclude it from refinement explicitly
    corpus = corpus.filter(F.size(F.col(vec_col)) == dims)
    assigned = assign_centroid(corpus, seeds, vec_col).select(
        "centroid_id", F.col(vec_col).alias("v")
    )
    sums = assigned.groupBy("centroid_id").agg(
        F.array(
            *[F.sum(F.col("v")[i].cast("double")).alias(f"s{i}") for i in range(dims)]
        ).alias("sum_vec"),
        F.count("*").alias("n"),
    )
    refined = {
        r["centroid_id"]: [s / r["n"] for s in r["sum_vec"]] for r in sums.collect()
    }
    return [refined.get(i, [float(x) for x in seeds[i]]) for i in range(len(seeds))]


def assign_centroid(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Tag each row with its nearest (max-cosine) centroid id.

    Assembled as ONE SQL string, not nested Columns: the original
    array_max-of-structs Column tree (n_centroids × dims literals
    threaded through py4j plus two interpreted HOF folds per score)
    cost ~2.5 s of driver-side plan build per invocation — measured on
    a 2000-row corpus where the actual scan takes milliseconds.

    The score is ``dot(v, cᵢ) / |cᵢ|``, NOT the full cosine: the
    ``1/|v|`` factor is a per-row positive constant, so dividing by it
    cannot change which centroid attains the max — dropping it removes
    the entire per-row norm computation (the argmax equivalence is
    oracle-verified: the DuckDB twins rank by full cosine and still
    hash-match). |cᵢ| folds to a Python float literal (same
    left-associated sum + sqrt ⇒ same IEEE double as the SQL fold);
    the expanded dot is numerically identical to the HOF fold (see
    dot_sql). Tie semantics unchanged: (score, prio=-i, cid) struct
    max prefers the LOWER centroid id on equal scores. A zero-norm
    input row scores 0 against every centroid and lands on cid 0 —
    the same centroid the previous all-NULL-scores form picked via
    the prio field. A zero centroid scores NULL (no direction), as
    before.

    Width-guarded via a SANITIZED vector column (ADVICE r4): a vector
    whose width differs from the codebook's is nulled before scoring,
    so it scores NULL against every centroid and lands on cid 0 via
    the prio field — the same landing NULL vectors get — instead of
    throwing INVALID_ARRAY_INDEX under ANSI mode. The guard CANNOT be
    a CASE around (or inside) the argmax: CaseWhen branches inline
    un-splittably, and the 64-term×n-centroid branch blows the JVM's
    64 KB generated-method limit, silently dropping the stage to
    interpreted eval. Indexing a NULL array is NULL (not an error)
    under ANSI, so the scorer itself stays one flat, method-splittable
    codegen expression."""
    dims = len(centroids[0])
    safe = "_vsafe"
    while safe in df.columns:
        safe += "_"
    structs = _centroid_score_structs(safe, centroids)
    return (
        df.withColumn(
            safe,
            F.expr(f"CASE WHEN SIZE({vec_col}) = {dims} THEN {vec_col} END"),
        )
        .withColumn("centroid_id", F.expr(f"array_max(array({structs}))['cid']"))
        .drop(safe)
    )


def _centroid_score_structs(vec_col: str, centroids: list[list[float]]) -> str:
    """The shared SQL text for per-centroid (score, prio, cid) structs
    — score = dot(v, cᵢ)/|cᵢ| (see assign_centroid's equivalence
    argument), prio = -i so descending sorts break score ties toward
    the lower centroid id. NOT width-guarded (a per-centroid CASE
    blew generated code past the JVM 64 KB method limit — see
    dot_sql); use sites wrap the WHOLE expression in one SIZE()
    branch (assign_centroid, ivf_topk's probe selection)."""
    dims = len(centroids[0])
    structs = []
    for i, c in enumerate(centroids):
        nc = math.sqrt(sum(float(x) * float(x) for x in c))
        if nc == 0.0:
            score = "CAST(NULL AS DOUBLE)"
        else:
            dot = " + ".join(
                f"(CAST({vec_col}[{j}] AS DOUBLE) * {float(c[j])!r})"
                for j in range(dims)
            )
            score = f"({dot}) / {nc!r}"
        structs.append(
            f"named_struct('score', {score}, 'prio', {-i}, 'cid', {i})"
        )
    return ", ".join(structs)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: int | None = None,
) -> DataFrame:
    """IVF search: probe only the ``nprobe`` centroids nearest each
    query; exact cosine within the probed cells.

    ``dims``: when the embedding width is known, the within-cell
    re-rank runs as a flat codegen sum with map-side norms instead of
    the interpreted higher-order fold — same summation order, same
    values (see dot_sql / cosine_topk)."""
    # Materialize the tagged corpus — this IS the IVF index, which a
    # production deployment computes once at ingest (module docstring),
    # so per-query assignment would be wrong-shaped anyway. It also
    # keeps the assignment's expanded-dot expression in its own
    # codegen stage: fused into the probe-join/window stage, the
    # combined processNext() grows beyond the JVM's 64 KB method limit
    # and the whole stage silently falls back to interpreted eval.
    tagged = (
        assign_centroid(corpus, centroids, vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            "centroid_id",
            *(
                [F.expr(norm_sql(vec_col, dims)).alias("_cn")]
                if dims is not None
                else []
            ),
        )
        .localCheckpoint(eager=False)
    )
    # prio = -i makes the descending sort prefer the LOWER centroid id
    # on score ties — the same (score DESC, cid ASC) order a SQL replay
    # uses, so probe sets are deterministic and cross-engine stable.
    # Same SQL-string assembly + dot/|c| scoring as assign_centroid
    # (ordering is invariant under the dropped positive 1/|v| factor);
    # the nested-Column HOF form cost seconds of plan build per query.
    # sanitized-vector width guard (see assign_centroid — a CASE
    # around the scorer blows the 64 KB codegen limit): a ragged query
    # vector is nulled before scoring, probing the same lowest-cid
    # cells a NULL query always has (ADVICE r4), instead of throwing
    # INVALID_ARRAY_INDEX under ANSI mode
    cents = F.expr(
        f"slice(reverse(array_sort(array("
        f"{_centroid_score_structs('_qsafe', centroids)}"
        f"))), 1, {int(nprobe)})"
    )
    qextra = (
        [F.expr(norm_sql(vec_col, dims)).alias("_qn")]
        if dims is not None
        else []
    )
    probes = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.expr(
                f"CASE WHEN SIZE({vec_col}) = {len(centroids[0])} "
                f"THEN {vec_col} END"
            ).alias("_qsafe"),
            *qextra,
        )
        .select("query_id", "_qvec", F.explode(cents).alias("_probe"), *
                (["_qn"] if dims is not None else []))
        .select(
            "query_id",
            "_qvec",
            F.col("_probe.cid").alias("centroid_id"),
            *(["_qn"] if dims is not None else []),
        )
    )
    cand = tagged.join(F.broadcast(probes), "centroid_id")
    if dims is not None:
        pair_cos = F.when(
            (F.col("_qn") * F.col("_cn")) != F.lit(0.0),
            F.expr(dot_sql("_qvec", "_cvec", dims))
            / (F.col("_qn") * F.col("_cn")),
        )
    else:
        pair_cos = cosine(F.col("_qvec"), F.col("_cvec"))
    scored = cand.withColumn("cosine", pair_cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Drop-in Pandas-UDF variant of ``cosine_topk``: the scoring runs
    as one numpy matmul per Arrow batch (SIMD throughput) instead of
    per-row zip_with folds. Same results, same schema — profile both
    and keep the faster one for your vector widths (SCALE.md).

    The (small) query matrix ships to executors inside the closure; the
    corpus streams through ``mapInPandas`` one Arrow batch at a time,
    emitting per-batch partial top-K (batch_rows × |queries| scores are
    never wider than the batch), then a global window finishes the
    top-K — the classic partial/final pattern.
    """
    import numpy as np

    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.array([r["v"] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(
                "query_id", queries.schema[query_id_col].dataType, True
            ),
            T.StructField("neighbor_id", corpus.schema[id_col].dataType, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)
            # zero-norm rows/queries → NaN; mark unrankable exactly
            # like the JVM path's null-cosine filter (NaN would
            # otherwise sort ABOVE every real value in Spark ordering)
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            n_c, n_q = sims.shape
            top = min(k, n_c)
            ids_np = pdf[id_col].to_numpy()
            frames = []
            for j in range(n_q):
                # full (-cos, id) lexsort per batch, not argpartition:
                # the partial top-k must respect the SAME tie-break as
                # the exact operator (cos desc, neighbor_id asc) or a
                # tied neighbor the final window would keep can be
                # discarded here before the window ever sees it
                order = np.lexsort((ids_np, -sims[:, j]))[:top]
                keep = order[np.isfinite(sims[order, j])]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[j],
                            "neighbor_id": ids_np[keep],
                            "cosine": sims[keep, j],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partial = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    dims: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) — the vector-space complement of MinHash dedup.

    ``exact=True``: all-pairs (correctness baseline, O(n²) — small
    corpora / oracle checks only). Default: hyperplane-LSH blocked
    self-join, sub-quadratic; recall controlled by bits/bands.

    Width requirement (BOTH paths, including ``exact=True``): vectors
    must be exactly ``dims`` elements wide. Scoring is the flat
    ``dims``-term codegen sum over width-guarded norms, so a row whose
    vector width ≠ dims gets a NULL cosine and silently drops from the
    output — callers with ragged widths must pad/filter upstream or
    pass the true width.
    """
    # pair scoring is the O(candidates) hot path: flat dims-term
    # codegen sum with map-side norms, not the interpreted HOF fold
    # (identical summation order/values — see dot_sql; ``dims`` is
    # already the caller's declared width for the LSH planes, and the
    # width-guarded norm gives ragged rows a NULL cosine that fails
    # the threshold, the same no-direction contract as zero norms)
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.expr(norm_sql(vec_col, dims)).alias("_n"),
    )
    if exact:
        left = base.select(
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
        )
        right = base.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
        )
        cand = left.join(right, F.col("id_a") < F.col("id_b"))
    else:
        planes = random_hyperplanes(dims, bits, seed)
        sig = base.select(
            "_id",
            "_v",
            "_n",
            F.posexplode(hyperplane_signature(F.col("_v"), planes, bands)).alias(
                "band_id", "bucket"
            ),
        )
        left = sig.select(
            "band_id",
            "bucket",
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
        )
        right = sig.select(
            "band_id",
            "bucket",
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
        )
        cand = (
            left.join(right, ["band_id", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    pair_cos = F.when(
        (F.col("_na") * F.col("_nb")) != F.lit(0.0),
        F.expr(dot_sql("_va", "_vb", dims)) / (F.col("_na") * F.col("_nb")),
    )
    return (
        cand.withColumn("cosine", pair_cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): cluster the embedding space,
    compare pairs ONLY within a cluster, and drop every vector that
    has a lower-id within-cluster neighbor above the cosine threshold.

    Returns the full roster ``(id, centroid_id, kept)`` — kept=false
    rows are the semantic duplicates a curation pipeline would drop.
    The keep-lowest-id rule makes the decision deterministic and
    engine-replayable (no dependence on iteration order), matching the
    paper's keep-one-representative semantics without a clustering
    pass over the pair graph.

    Scale shape: assignment is a map-only argmax over a broadcast
    codebook literal; the only shuffle is the centroid-keyed self-join,
    O(Σ cluster²) — never all-pairs — and cluster sizes are bounded by
    the codebook granularity the caller picks (the paper uses ~11k
    clusters for ~100M embeddings, keeping cells in the thousands).
    Pass a deterministic codebook (`kmeans_lite` or an md5-seeded
    sample) when the output must be reproducible across engines.

    ``dims``: when the embedding width is known, the pair scoring —
    the O(Σ cluster²) hot path — runs as a flat ``dims``-term codegen
    sum (`dot_sql`) with per-row norms precomputed map-side, instead
    of the interpreted higher-order fold; same summation order, same
    values (see dot_sql). Omit for width-agnostic (slow-path) use.

    Duplication invariance: identical vectors are CONTRACTED before
    mining (the dedup_clusters_exact move). A crawl-shaped corpus
    with r replicas per vector would otherwise grow every cluster's
    pair join r² — a 10×-replicated 2k-vector probe shuffled ~25M
    vector-carrying pairs and ran for minutes; contracted, mining
    sees only distinct vectors and runtime is invariant to
    duplication. Exactness: any non-minimal member of an identical
    group has its group's min id as a cos=1 ≥ threshold witness, so
    it is dropped in the uncontracted semantics too (any threshold
    ≤ 1); a representative is dropped iff another group within
    threshold has a smaller min id — ∃ member < rep ⟺ min(other)
    < rep. NULL and zero-norm vectors are exempted from contraction
    (their pair cosine is NULL, never ≥ threshold, so uncontracted
    semantics keeps every one — each stays its own group)."""
    from pyspark.sql import Window

    base = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v")
    )
    nrm = (
        F.expr(norm_sql("_v", dims)) if dims is not None else _norm(F.col("_v"))
    )
    # rep id per row in ONE vector-keyed exchange (window, no join);
    # null/zero-norm rows are their own group
    contractible = F.col("_v").isNotNull() & (nrm != F.lit(0.0))
    base = base.withColumn(
        "_rep",
        F.when(
            contractible,
            F.min("id").over(Window.partitionBy("_v")),
        ).otherwise(F.col("id")),
    ).localCheckpoint(eager=False)
    reps = base.filter(F.col("id") == F.col("_rep")).select("id", "_v")

    # One materialization feeds three consumers (pair-join left, pair-
    # join right, decision roster) — without it the assignment argmax
    # subtree is recomputed per consumer (self-joins share no
    # exchange). localCheckpoint over persist(): blocks free with the
    # DataFrame instead of pinning a CacheManager entry. EAGER: a lazy
    # checkpoint leaves the full n_centroids×dims assignment expression
    # inside all three consumers' logical plans until materialization,
    # so the optimizer re-walks ~3 copies of it; eager materialization
    # collapses them to a leaf (measured ~1 s of driver time at 8×64).
    tagged = (
        assign_centroid(reps, centroids, "_v")
        .select("id", "_v", "centroid_id")
        .localCheckpoint(eager=True)
    )
    if dims is not None:
        tagged = tagged.withColumn("_n", F.expr(norm_sql("_v", dims)))
        pair_cos = F.when(
            (F.col("_na") * F.col("_nb")) != F.lit(0.0),
            F.expr(dot_sql("_va", "_vb", dims)) / (F.col("_na") * F.col("_nb")),
        )
        extra_a, extra_b = [F.col("_n").alias("_na")], [F.col("_n").alias("_nb")]
    else:
        pair_cos = cosine(F.col("_va"), F.col("_vb"))
        extra_a, extra_b = [], []
    left = tagged.select(
        "centroid_id", F.col("id").alias("id_a"), F.col("_v").alias("_va"), *extra_a
    )
    right = tagged.select(
        "centroid_id", F.col("id").alias("id_b"), F.col("_v").alias("_vb"), *extra_b
    )
    dropped = (
        left.join(right, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", pair_cos)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    rep_decisions = tagged.join(dropped, "id", "left").select(
        F.col("id").alias("_rep"),
        "centroid_id",
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("_rep_kept"),
    )
    # members inherit their representative's centroid (same vector);
    # non-minimal members are semantic duplicates by construction
    return base.join(rep_decisions, "_rep").select(
        "id",
        "centroid_id",
        ((F.col("id") == F.col("_rep")) & F.col("_rep_kept")).alias("kept"),
    )


def seed_vectors(
    corpus: DataFrame, n: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """The ``n`` corpus vectors of smallest md5(id) — the seed-only
    codebook trick ann_ivf_oracle introduced: derived with NO
    floating-point aggregation, so any engine reproduces the exact
    same centroids from the same data. The collect is bounded by n."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h")
        .limit(n)
        .collect()
    )
    return [list(map(float, r["_v"])) for r in rows]


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    vector into ``m`` contiguous subspaces; sub-codebook ``s`` holds
    the seed vectors' s-th slices. Seed-only construction (see
    seed_vectors) keeps the whole PQ pipeline engine-replayable; a
    production deployment swaps in per-subspace k-means (kmeans_lite)
    with identical downstream shapes. Returns m × n_codes × (dims/m)."""
    seeds = seed_vectors(corpus, n_codes, id_col, vec_col)
    dims = len(seeds[0])
    if dims % m:
        raise ValueError(f"dims ({dims}) must divide into {m} subspaces")
    sub = dims // m
    return [
        [v[s * sub : (s + 1) * sub] for v in seeds] for s in range(m)
    ]


def _pq_cc(centroid: list[float]) -> float:
    """‖c‖² as a left-associated Python sum — the same IEEE double the
    oracles' explicit SQL addition chain produces."""
    acc = 0.0
    for x in centroid:
        acc += float(x) * float(x)
    return acc


def _pq_rankdist_sql(vec_col: str, centroid: list[float], offset: int) -> str:
    """Flat codegen SQL for ``‖c‖² − 2·v_sub·c`` — equal to
    ‖v_sub − c‖² minus the per-row constant ‖v_sub‖², so ARGMIN over
    centroids is unchanged (and ADC adds the query-side ‖q_sub‖² back
    to recover the true distance). This form exists for the JVM 64 KB
    generated-method limit: the POWER(v−c, 2) expansion put the encode
    Project past it even split per subspace (whole-stage codegen
    cannot method-split expressions over local variables), while the
    multiply-only dot chain compiles. Sequential left-associated sum,
    replayed verbatim by the DuckDB oracles (1-based twin there;
    ``offset`` here is 0-based)."""
    dot = " + ".join(
        f"(CAST({vec_col}[{offset + j}] AS DOUBLE) * {float(c)!r})"
        for j, c in enumerate(centroid)
    )
    return f"({_pq_cc(centroid)!r} - (2.0 * ({dot})))"


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as one packed BIGINT of per-subspace nearest
    sub-centroid ids (4 bits per code for ≤16 codes — m=8 subspaces
    pack into 32 bits, the zorder.py bit-packing playbook). Returns
    ``(id, pq_code)``.

    Per subspace the argmin is an ``array_min`` over (dist², prio,
    cid) structs with the same lower-id tie rule as assign_centroid.
    Ragged/NULL vectors get a NULL code. Map-only: the 100 TB encode
    is one scan, and codes are 8 bytes/vector (64× smaller than
    64-dim float64 embeddings).

    Codegen shape, measured: the m argmins are separate projection
    columns in the multiply-only ``_pq_rankdist_sql`` form (half the
    generated code of the POWER(v−c,2) expansion), packed in a second
    projection that ``_nocollapse`` keeps from being re-inlined
    (SPARK-36718's don't-duplicate-expensive-expressions rule). Even
    so, the FUSED whole-stage processNext() for m=8×n_codes=16 exceeds
    the JVM's 64 KB method limit — whole-stage codegen cannot
    method-split expressions over local variables — and Spark falls
    back to PER-OPERATOR codegen for the stage (UnsafeProjection with
    row-input splitting, which compiles; not row-by-row
    interpretation). That is the accepted trade: the encode is a
    map-only ingest-time pass, and the per-operator-codegen scan
    throughput is within noise of fused at sf0.1. Shrinking the
    codebook (m or n_codes) re-enters fused territory if a deployment
    needs it."""
    m = len(codebooks)
    n_codes = len(codebooks[0])
    sub = len(codebooks[0][0])
    if n_codes > 16:
        raise ValueError("packed codes support at most 16 centroids (4 bits)")
    dims = m * sub
    safe = "_vsafe"
    while safe in corpus.columns:
        safe += "_"
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"CASE WHEN SIZE({vec_col}) = {dims} THEN {vec_col} END").alias(
            safe
        ),
    )
    code_cols = []
    for s in range(m):
        structs = ", ".join(
            f"named_struct('d', {_pq_rankdist_sql(safe, c, s * sub)},"
            f" 'prio', {ci}, 'cid', {ci})"
            for ci, c in enumerate(codebooks[s])
        )
        # array_min: smallest (d, prio) → nearest centroid, lower cid
        # on exact ties
        code_cols.append(
            F.expr(f"array_min(array({structs}))['cid']").alias(f"_c{s}")
        )
    encoded = base.select("id", F.col(safe).isNull().alias("_bad"), *code_cols)
    # each code column referenced TWICE (pack + _nocollapse) — blocks
    # CollapseProject from rebuilding the single giant expression
    nocollapse = " + ".join(f"_c{s}" for s in range(m))
    # cast BEFORE multiplying: cid is INT and code_7 × 2^28 overflows
    # int32 under ANSI. NULL-code ragged vectors through ADDITION, not
    # a CASE around the pack (tiny guard branch, NULL propagates).
    packed = (
        " + ".join(f"(CAST(_c{s} AS BIGINT) * {1 << (4 * s)})" for s in range(m))
        + " + CASE WHEN _bad THEN CAST(NULL AS BIGINT) ELSE 0 END"
        # numeric no-op second reference (x*0 is not constant-folded —
        # x could be null); when codes ARE null, _bad already nulls
        # the whole pack
        + f" + (CAST(({nocollapse}) AS BIGINT) * 0)"
    )
    return encoded.select("id", F.expr(packed).alias("pq_code"))


def _pq_adc_table(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    query_id_col: str,
    vec_col: str,
) -> DataFrame:
    """The per-(query, subspace, code) ADC distance table —
    ``d2 = ‖q_sub‖² + (‖c‖² − 2·q_sub·c)`` rounded to scaled BIGINTs
    (order-free sums downstream). Built as per-SUBSPACE explodes
    unioned together: one array of all m×n_codes structs put every
    product term into a single generated method — past the JVM's 64 KB
    limit, silently interpreting the stage; each per-subspace array
    compiles. EAGERLY localCheckpointed: without it the optimizer and
    codegen re-walk the ~1000-term union subtree per consuming stage
    inside the broadcast — measured 3.4 s → 0.3 s on a 640-row table
    at sf0.1. The table is n_queries × m × n_codes rows by
    construction, so the checkpoint is broadcast-scale."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    dims = m * sub
    qq_cols = [
        F.expr(
            " + ".join(
                f"(CAST(_q[{s * sub + j}] AS DOUBLE)"
                f" * CAST(_q[{s * sub + j}] AS DOUBLE))"
                for j in range(sub)
            )
        ).alias(f"_qq{s}")
        for s in range(m)
    ]
    qbase = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(
            f"CASE WHEN SIZE({vec_col}) = {dims} THEN {vec_col} END"
        ).alias("_q"),
    ).select("query_id", "_q", *qq_cols)
    per_sub = []
    for s in range(m):
        entries = ", ".join(
            f"named_struct('code', {ci}, 'd2',"
            f" (_qq{s} + {_pq_rankdist_sql('_q', c, s * sub)}))"
            for ci, c in enumerate(codebooks[s])
        )
        per_sub.append(
            qbase.select(
                "query_id",
                F.lit(s).alias("s"),
                F.explode(F.expr(f"array({entries})")).alias("_e"),
            ).select(
                "query_id",
                "s",
                F.col("_e.code").alias("code"),
                F.expr("CAST(ROUND(_e.d2 * 1e9) AS BIGINT)").alias("d_i"),
            )
        )
    table = per_sub[0]
    for t in per_sub[1:]:
        table = table.unionByName(t)
    return table.localCheckpoint(eager=True)


def _pq_probe_rows(codes: DataFrame, m: int) -> DataFrame:
    """Unpack (id, pq_code) into (doc_id, s, code) probe rows — pure
    shift/mask arithmetic, m rows per code."""
    return codes.select(
        F.col("id").alias("doc_id"),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('s', {s}, 'code',"
                    f" CAST(shiftright(pq_code, {4 * s}) & 15 AS INT))"
                    for s in range(m)
                )
                + ")"
            )
        ).alias("_p"),
    ).select("doc_id", F.col("_p.s").alias("s"), F.col("_p.code").alias("code"))


def _pq_rank(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("_d").cast("double") / F.lit(1e9)).alias("adist"),
        )
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-``k``: approximate L2² between a
    query and an encoded vector is the sum over subspaces of the exact
    distance from the query's slice to the vector's assigned
    sub-centroid. Returns ``(query_id, rank, doc_id, adist)``.

    Plan shape: the per-(query, subspace, code) distance table
    (see _pq_adc_table) is BROADCAST; codes explode into (doc, s,
    code) probes that hash-join the table — the big side never
    shuffles vectors, only 8-byte codes. Distance entries round to
    scaled BIGINTs so the cross-subspace sum is aggregation-order-free
    (the bm25_topk playbook); ranking ties break by doc id. At 100 TB
    this is the memory-resident rerank path: 8 bytes/vector of state
    against full-vector scans."""
    m = len(codebooks)
    table = _pq_adc_table(queries, codebooks, query_id_col, vec_col)
    probes = _pq_probe_rows(codes, m)
    scored = (
        probes.join(F.broadcast(table), ["s", "code"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("d_i").alias("_d"))
        # every doc yields exactly m probe rows, so a (query, doc)
        # group is complete by construction
    )
    return _pq_rank(scored, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVFADC — the billion-scale ANN composition (Jégou et al., TPAMI
    2011 §V; what FAISS's IndexIVFPQ runs): a coarse IVF codebook
    prunes the search to the ``nprobe`` cells nearest each query, and
    PQ asymmetric distance ranks only those cells' members from their
    8-byte codes. Returns ``(query_id, rank, doc_id, adist)``.

    Index state (cell id + packed code per vector) is built here and
    eagerly materialized — a production deployment computes it once at
    ingest (the ivf_topk materialization argument) and partitions the
    code table by ``centroid_id`` so a query's candidate fetch
    directory-prunes to its probed cells. Per query the work is
    nprobe/n_cells of the corpus' CODES (not vectors): at 100 TB that
    is the difference between scanning embeddings and streaming a few
    GB of codes through a broadcast table join."""
    cells = assign_centroid(corpus, centroids, vec_col).select(
        F.col(id_col).alias("id"), "centroid_id"
    )
    index = (
        pq_encode(corpus, codebooks, id_col, vec_col)
        .join(cells, "id")
        .localCheckpoint(eager=True)
    )
    # nprobe cells per query — the ivf_topk probe selection (sanitized
    # vector, one flat scorer expression, lazy CASE never indexes
    # ragged rows)
    cents = F.expr(
        f"slice(reverse(array_sort(array("
        f"{_centroid_score_structs('_qsafe', centroids)}"
        f"))), 1, {int(nprobe)})"
    )
    probes_cells = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.expr(
                f"CASE WHEN SIZE({vec_col}) = {len(centroids[0])} "
                f"THEN {vec_col} END"
            ).alias("_qsafe"),
        )
        .select("query_id", F.explode(cents).alias("_probe"))
        .select("query_id", F.col("_probe.cid").alias("centroid_id"))
    )
    cand = index.join(F.broadcast(probes_cells), "centroid_id").select(
        "query_id", "id", "pq_code"
    )
    # (query, doc) pairs are unique (one cell per doc), but a doc
    # probed by several queries must contribute ONE set of probe rows
    # — unpack codes from the distinct doc side, then fan out by pair
    cand_pairs = cand.select("query_id", F.col("id").alias("doc_id"))
    doc_codes = cand.select("id", "pq_code").distinct()
    table = _pq_adc_table(queries, codebooks, query_id_col, vec_col)
    scored = (
        _pq_probe_rows(doc_codes, len(codebooks))
        .join(cand_pairs, "doc_id")
        .join(F.broadcast(table), ["query_id", "s", "code"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum("d_i").alias("_d"))
    )
    return _pq_rank(scored, k)


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force L2² top-``k`` per query — the ground-truth
    baseline PQ/IVF recall is measured against (cosine_topk's twin for
    Euclidean ANN). Returns ``(query_id, rank, doc_id, d2)``.

    Ranking is by the scaled-BIGINT ``ROUND(d2 × 1e9)`` with id ASC
    ties — near-equal doubles could order differently across engines'
    sort implementations at raw-double ties, the rounded integer
    cannot. Broadcast query side; one corpus scan; flat codegen
    distance sums (width-guarded by a sanitized vector column, the
    assign_centroid pattern)."""
    from pyspark.sql import Window

    d2 = " + ".join(
        f"POWER(CAST(_q[{i}] AS DOUBLE) - CAST(_v[{i}] AS DOUBLE), 2)"
        for i in range(dims)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(
            f"CASE WHEN SIZE({vec_col}) = {dims} THEN {vec_col} END"
        ).alias("_q"),
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"CASE WHEN SIZE({vec_col}) = {dims} THEN {vec_col} END"
            ).alias("_v"),
        )
        .join(F.broadcast(q), how="cross")
        .select(
            "query_id",
            "doc_id",
            F.expr(f"CAST(ROUND(({d2}) * 1e9) AS BIGINT)").alias("_d"),
        )
        .filter(F.col("_d").isNotNull())  # ragged rows are unrankable
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("_d").cast("double") / F.lit(1e9)).alias("d2"),
        )
    )


def embedding_decontamination(
    corpus: DataFrame,
    probes: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dims: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: for each probe (an eval-set
    item), the nearest corpus vector by cosine and whether it clears
    ``threshold`` — the semantic companion to n-gram decontamination
    (paraphrased eval leakage that shares no 5-gram still lands next
    to its source in embedding space; see the decontamination
    discussions in GPT-3 §4 / SemDeDup).

    Returns ``(probe_id, nearest_id, max_cos, contaminated)`` — one
    row per probe with a non-degenerate nearest (zero-norm pairs rank
    nowhere), argmax ties broken by corpus id ascending, ``max_cos``
    rounded to 6 dp for the cross-engine hash (ordering uses the
    unrounded value — the same convention as the ann_cosine_topk
    registry query over ``cosine_topk``).

    Scale shape: eval sets are tiny and corpora are huge, so the PROBE
    side broadcasts and the corpus is scanned exactly once — the same
    plan at 100 TB, no shuffle of corpus vectors (the per-probe argmax
    reduces map-side through the ranking window's partial sort). For
    recall-traded acceleration swap the scan for the IVF/LSH-bucketed
    candidate generation (`ivf_topk`/`lsh_topk`) — same decision
    schema."""
    from pyspark.sql import Window

    # thin wrapper over cosine_topk with k=1 — ONE copy of the
    # broadcast/cross/rank nearest-neighbor pipeline; this just
    # renames and adds the rounded value + threshold decision
    nearest = cosine_topk(
        corpus,
        probes.select(
            F.col(probe_id_col).alias("query_id"),
            F.col(vec_col).alias(vec_col),
        ),
        k=1,
        id_col=id_col,
        vec_col=vec_col,
        dims=dims,
    )
    return nearest.select(
        F.col("query_id").alias("probe_id"),
        F.col("neighbor_id").alias("nearest_id"),
        F.round("cosine", 6).alias("max_cos"),
        (F.col("cosine") >= F.lit(float(threshold))).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (FAISS IndexScalarQuantizer QT_8bit) — the
# quantization family's other workhorse next to PQ: one byte per
# DIMENSION (4× smaller than float32, no codebook training), per-dim
# affine grid from the corpus min/max.
# ---------------------------------------------------------------------------

SQ_LEVELS = 256
SQ_SCALE = "1e6"  # reconstruction quantum for the order-free BIGINT sums


def sq_code_sql(elem: str, mn: str, step: str) -> str:
    """Shared-dialect SQL for one dimension's 8-bit code:
    ``clamp(floor((v − mn) / step), 0, 255)``. ``elem``/``mn``/``step``
    are SQL fragments — Spark interpolates Python float literals and
    0-based element access, the DuckDB oracle interpolates column refs
    over its own MIN/MAX aggregate and 1-based access; everything else
    is the SAME string, so the IEEE arithmetic cannot drift. The
    ``step > 0`` guard pins the degenerate constant dimension to code
    0 in both engines."""
    body = (
        f"LEAST(255, GREATEST(0, CAST(FLOOR((CAST({elem} AS DOUBLE)"
        f" - {mn}) / {step}) AS BIGINT)))"
    )
    return f"CASE WHEN {step} > 0.0 THEN {body} ELSE CAST(0 AS BIGINT) END"


def sq_recon_scaled_sql(elem: str, mn: str, step: str) -> str:
    """Shared-dialect SQL for one dimension's RECONSTRUCTED value on
    the SQ8 grid, scaled to a BIGINT: ``ROUND((mn + (code + 0.5) ×
    step) × 1e6)``. Per-element rounding keeps every downstream
    distance a pure BIGINT sum — aggregation-order-free, so partition
    order can never flip a rank (the bm25/l2_topk playbook)."""
    code = sq_code_sql(elem, mn, step)
    return (
        f"CASE WHEN {step} > 0.0 THEN CAST(ROUND(({mn} + ((CAST({code}"
        f" AS DOUBLE) + 0.5) * {step})) * {SQ_SCALE}) AS BIGINT)"
        f" ELSE CAST(ROUND({mn} * {SQ_SCALE}) AS BIGINT) END"
    )


def sq_params(
    corpus: DataFrame, dims: int = 64, vec_col: str = "embedding"
) -> tuple[list[float], list[float], list[float]]:
    """Per-dimension (min, max, step) of the SQ8 grid from ONE
    aggregate pass over the corpus (step = (max − min)/256). MIN/MAX
    of float32 values widened to double involve no FP accumulation,
    so any engine re-derives bit-identical parameters from the same
    data — the quantizer is 192 doubles, broadcast as plan literals
    exactly like the PQ codebooks. Ragged vectors are excluded by the
    SIZE guard (assign_centroid's sanitization rule)."""
    base = corpus.filter(F.expr(f"SIZE({vec_col}) = {dims}"))
    aggs: list[F.Column] = []
    for i in range(dims):
        e = F.expr(f"CAST({vec_col}[{i}] AS DOUBLE)")
        aggs.append(F.min(e).alias(f"_mn{i}"))
        aggs.append(F.max(e).alias(f"_mx{i}"))
    row = base.agg(*aggs).first()
    mins = [float(row[f"_mn{i}"]) for i in range(dims)]
    maxs = [float(row[f"_mx{i}"]) for i in range(dims)]
    steps = [(mx - mn) / float(SQ_LEVELS) for mn, mx in zip(mins, maxs)]
    return mins, maxs, steps


def sq_encode(
    corpus: DataFrame,
    mins: list[float],
    steps: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8-encode each vector: ``(id, sq_code)`` where ``sq_code`` is
    the comma-joined 64-byte code string (one byte per dimension —
    4× smaller than float32; a production sink would store the raw
    byte array, the string form is the hash-stable exchange format).
    Map-only scan, flat codegen clamp/floor chains, no shuffle."""
    dims = len(mins)
    codes = ", ".join(
        sq_code_sql(f"{vec_col}[{i}]", repr(mins[i]), repr(steps[i]))
        for i in range(dims)
    )
    return corpus.filter(F.expr(f"SIZE({vec_col}) = {dims}")).select(
        F.col(id_col).alias("id"),
        F.expr(
            f"array_join(transform(array({codes}),"
            " x -> CAST(x AS STRING)), ',')"
        ).alias("sq_code"),
    )


def _sq_recon_col(
    mins: list[float], steps: list[float], vec_col: str
) -> F.Column:
    dims = len(mins)
    recon = ", ".join(
        sq_recon_scaled_sql(f"{vec_col}[{i}]", repr(mins[i]), repr(steps[i]))
        for i in range(dims)
    )
    return F.expr(f"ARRAY({recon})")


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    mins: list[float],
    steps: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Symmetric SQ8 L2 top-``k``: both sides reconstruct onto the
    8-bit grid (scaled BIGINTs), distance is the exact integer
    ``Σ (qr_i − cr_i)²`` — FAISS's symmetric scalar-quantizer distance
    with the engine's order-free integer arithmetic. Returns
    ``(query_id, rank, doc_id, d2)`` with ``d2`` descaled to the
    double L2² approximation.

    Scale: the quantizer (192 doubles) folds into the plan; the
    corpus side is ONE map-only scan producing 64 BIGINTs per row that
    feed the broadcast-query distance loop — no corpus shuffle, no
    codebook join; the per-query top-k is the l2_topk window. At 100
    TB the stored index is the 64-byte codes (sq_encode), and the
    reconstruction is a map-side decode of those codes — same plan
    shape, 4× less IO than raw float32."""
    from pyspark.sql import Window

    dims = len(mins)
    q = queries.filter(F.expr(f"SIZE({vec_col}) = {dims}")).select(
        F.col(query_id_col).alias("query_id"),
        _sq_recon_col(mins, steps, vec_col).alias("_qr"),
    )
    c = corpus.filter(F.expr(f"SIZE({vec_col}) = {dims}")).select(
        F.col(id_col).alias("doc_id"),
        _sq_recon_col(mins, steps, vec_col).alias("_cr"),
    )
    scored = c.join(F.broadcast(q), how="cross").select(
        "query_id",
        "doc_id",
        F.expr(
            "aggregate(zip_with(_qr, _cr, (x, y) -> (x - y) * (x - y)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("_d"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("doc_id"))
    scale2 = float(SQ_SCALE) * float(SQ_SCALE)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("_d").cast("double") / F.lit(scale2)).alias("d2"),
        )
    )


def embedding_outlier_gate(
    corpus: DataFrame,
    centroids: list[list[float]],
    keep_permille: int = 900,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier pruning — the SSL-prefilter curation
    step (used by DataComp-style pipelines and the D4 recipe ahead of
    SemDeDup): assign each vector to its nearest centroid, score it by
    distance to that centroid, and DROP the farthest tail WITHIN each
    cell (per-cell percentiles, because cell radii differ — the same
    within-group calibration argument as score_percentiles).

    Returns ``(id, centroid_id, d2_scaled, pctl_permille, keep)`` with
    ``keep = pctl_permille <= keep_permille`` (900 drops the farthest
    ~10% of each cell). ``d2_scaled`` is the 1e9-scaled BIGINT L2² to
    the assigned centroid, so ranking and the percentile arithmetic
    are exact integers end to end.

    Scale: assignment is the broadcast-codebook argmax scan
    (assign_centroid); the distance joins a |cells|-row broadcast
    centroid relation; percentiles run over per-(cell, distance)
    counts (aggregate-before-window), never vector rows. Ragged
    vectors are excluded upfront (no distance is defined for them)."""
    from ..operators.quality import score_percentiles

    dims = len(centroids[0])
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cent = corpus.sparkSession.createDataFrame(
        cent_rows, "centroid_id int, _cv array<double>"
    )
    base = corpus.filter(F.expr(f"SIZE({vec_col}) = {dims}")).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    assigned = assign_centroid(base, centroids, vec_col="_v")
    d2 = " + ".join(
        f"POWER(CAST(_v[{i}] AS DOUBLE) - _cv[{i}], 2)" for i in range(dims)
    )
    scored = (
        assigned.join(F.broadcast(cent), "centroid_id")
        .select(
            "_id",
            "centroid_id",
            F.expr(f"CAST(ROUND(({d2}) * 1e9) AS BIGINT)").alias(
                "d2_scaled"
            ),
        )
        # two consumers inside score_percentiles (the count aggregate
        # and the join-back) would each re-run the codebook-argmax +
        # distance scan; the checkpointed relation is 3 scalars/row —
        # the narrow-materialization trade curation_funnel proved
        .localCheckpoint(eager=False)
    )
    pct = score_percentiles(scored, "d2_scaled", "centroid_id", "_id")
    return pct.select(
        F.col("_id").alias(id_col),
        "centroid_id",
        "d2_scaled",
        "pctl_permille",
        (F.col("pctl_permille") <= keep_permille).alias("keep"),
    )
