"""Connected components over an edge list — duplicate-cluster building.

The near-dup operators (dedup.py: MinHash-LSH, SimHash, exact Jaccard)
emit PAIRS; a curation pipeline needs CLUSTERS ("these 40 documents are
all the same boilerplate — keep one"). Pairs → clusters is connected
components on the undirected similarity graph, the canonical iterative
algorithm a pure SQL engine can't express (the reference has nothing
like it; DuckDB needs a recursive CTE — which is exactly what the
driver oracle for `dedup_clusters` uses).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min label over itself
and its neighbors; converged labels equal the min node id reachable in
the component. Rounds needed = graph diameter — for near-dup clusters
(dense, star-ish) that is 2-3; the loop exits on a converged fixpoint,
not a guess.

Scale notes (100 TB):
- each round is ONE shuffle: edges are pre-symmetrized and hash-
  partitioned by ``src`` once, labels re-partition by ``id`` to meet
  them, so the join is co-partitioned after round 1.
- ``localCheckpoint`` after every round truncates the lineage —
  without it the plan doubles per iteration and planning time
  explodes long before data size matters.
- label propagation converges in O(diameter) rounds; for adversarial
  long-chain graphs use the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) — same join primitive, O(log² n) rounds. Near-dup
  graphs are diameter-bounded so the simple form is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cc_driver(pairs: DataFrame, edges_pd=None) -> DataFrame:
    """Union-find on the driver for a below-threshold edge list.

    The same cost-based escape hatch a broadcast join is: when the
    small side fits in driver memory, shipping it beats N distributed
    rounds of shuffle+checkpoint overhead. Min-label semantics match
    the distributed path exactly (component = min node id).

    ``edges_pd`` is the already-collected edge frame when the caller's
    size probe doubled as the collect (connected_components); ``pairs``
    still supplies the session and endpoint schema."""
    import pandas as pd

    if edges_pd is None:
        edges_pd = pairs.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_pd["a"], edges_pd["b"]):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    out = pd.DataFrame(
        {
            "id": list(parent.keys()),
            "component": [comp_min[find(n)] for n in parent],
        }
    )
    spark = pairs.sparkSession
    # One common endpoint type for BOTH output columns, matching the
    # distributed path (which unions src and dst into a single id column
    # and lets Spark promote to the wider numeric type). Without this,
    # int-src/long-dst edges would give the driver path an
    # `id int, component bigint` schema the distributed path never has.
    sa = pairs.schema["a"].dataType.simpleString()
    sb = pairs.schema["b"].dataType.simpleString()
    if sa == sb:
        common = sa
    else:
        _widening = ["tinyint", "smallint", "int", "bigint", "float", "double"]
        if sa not in _widening or sb not in _widening:
            raise TypeError(f"incompatible edge endpoint types: {sa} vs {sb}")
        common = max(sa, sb, key=_widening.index)
    schema = f"id {common}, component {common}"
    if out.empty:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    driver_edge_threshold: int = 2_000_000,
    fallback_star: bool = True,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id in the node's connected
    component — deterministic regardless of partitioning or iteration
    schedule, so results are exactly reproducible (and oracle-able
    against a recursive-CTE transitive closure).

    Physical strategy is cost-based, mirroring how Spark itself picks
    broadcast vs shuffle joins: the edge list is materialized once
    (needed by every downstream variant), counted, and if it holds ≤
    ``driver_edge_threshold`` edges (default 2M ≈ tens of MB — the
    same order as a broadcast-join build side) the components are
    solved by driver union-find in one pass — O(E α(E)) with zero
    further cluster work. Above the threshold, iterative distributed
    min-label propagation takes over. After near-dup contraction
    (dedup_clusters_exact) most real corpora's similarity graphs fall
    under the threshold; adversarially huge edge sets still get the
    O(diameter)-round distributed path. Set
    ``driver_edge_threshold=0`` to force distributed.
    """
    # Null endpoints are dropped EXPLICITLY: the distributed path would
    # shed them at its join keys anyway, but the driver union-find
    # receives them as pandas NaN, and NaN != NaN means its find() loop
    # never terminates — the two paths must agree on the edge set. On
    # the distributed path the (possibly expensive) edge-mining plan is
    # localCheckpointed before symmetrizing — the union reads it twice,
    # and the distinct re-partitions the symmetric edge list by content
    # hash, which the per-round joins then reuse from the checkpoint.
    pairs = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    if driver_edge_threshold:
        # ONE action decides the strategy AND ships the edges: a
        # limit(threshold+1) collect both proves |E| ≤ threshold and
        # delivers the edge list — the previous
        # localCheckpoint+count+toPandas sequence paid three jobs for
        # the same information, which dominated small-graph calls
        # (every per-drain delta-CC in the ingest family is one).
        # Union-find is row-order-independent, so an arbitrary collect
        # order is fine. The rare above-threshold probe wastes one
        # evaluation of the mining plan before the checkpoint below —
        # the tiny-graph path is the hot one by design.
        edges_pd = pairs.limit(driver_edge_threshold + 1).toPandas()
        if len(edges_pd) <= driver_edge_threshold:
            return _cc_driver(pairs, edges_pd)
    pairs = pairs.localCheckpoint()
    sym = (
        pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # label side is |nodes|-sized (≪ |edges| for dense near-dup
        # graphs) — AQE broadcasts it while it fits, making each round
        # one groupBy shuffle; at huge node counts it degrades
        # gracefully to a sort-merge join. No forced repartition: extra
        # exchanges per round cost more than they organize.
        neigh_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nmin"))
        )
        # fuse the convergence probe into the same materialization:
        # carry a changed flag, checkpoint once, sum the flag (a cheap
        # second pass over the checkpointed partitions)
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.a, "left")
            .select(
                "id",
                F.least("comp", F.coalesce("nmin", F.col("comp"))).alias("_new"),
                (F.coalesce("nmin", F.col("comp")) < F.col("comp"))
                .cast("long")
                .alias("_chg"),
            )
            .withColumnRenamed("_new", "comp")
            .localCheckpoint()
        )
        changed = new_labels.agg(F.sum("_chg")).first()[0]
        labels = new_labels.drop("_chg")
        if not changed:
            break
    else:
        # Silently returning partially-propagated labels would hand
        # downstream dedup WRONG clusters (two halves of one long
        # chain as separate components). Label propagation needs
        # O(diameter) rounds — a graph that exhausts the cap is the
        # adversarial-topology case the alternating-star algorithm
        # exists for, so by default the job switches algorithm
        # instead of dying (semantics are identical: component = min
        # reachable id). fallback_star=False restores the hard error
        # for callers that want to know their diameter assumption
        # broke.
        if fallback_star:
            import warnings

            warnings.warn(
                f"label propagation did not converge in "
                f"{max_iterations} rounds (graph diameter exceeds the "
                "cap); falling back to connected_components_star",
                RuntimeWarning,
                stacklevel=2,
            )
            return connected_components_star(pairs, src="a", dst="b")
        raise RuntimeError(
            f"label propagation did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the cap) — use "
            "connected_components_star, which converges in O(log n) "
            "rounds regardless of diameter"
        )
    return labels.select("id", F.col("comp").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 60,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 §3) — the adversarial-topology companion to
    ``connected_components``: label propagation needs O(diameter)
    rounds (a path graph of n nodes takes n rounds), while the
    alternating-star recurrence provably converges in O(log n) rounds
    on ANY topology, each round two bounded shuffles. Same output
    contract as every components variant here: ``component`` = min
    node id reachable (equivalence property-fuzzed against the
    union-find and label-propagation paths).

    Round shape, on a canonical min-first edge list (u < v):

    - **large-star**: around every center c, hang every LARGER
      neighbor off m = min(neighborhood ∪ {c}) — one (center)-keyed
      min aggregate + one join; never creates self-loops since
      m ≤ c < v.
    - **small-star**: around every center c, hang every SMALLER
      neighbor (and c itself) off m = min of the smaller
      neighborhood — the step that collapses chains from the low end.

    Convergence (edge set reaches the fixpoint: a union of stars
    centered at component minima) is detected EXACTLY — count match +
    empty ``exceptAll`` — not via a hashed checksum that could
    silently accept a collision. Each round localCheckpoints the edge
    relation: same lineage-truncation requirement as label
    propagation, plus it feeds the convergence probe twice.

    Scale: per round the shuffles are keyed by center id and carry at
    most |E| rows; high-degree minima are exactly the stars the
    algorithm builds on purpose (the min aggregate combines map-side,
    so a billion-leaf star costs its partition count, not a hot
    reducer). 2× the per-round cost of label propagation — worth it
    when diameter is unknown or unbounded; near-dup similarity graphs
    are diameter-2-3, which is why it is not the default."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_n = e.count()
    for _ in range(max_iterations):
        # large-star: adjacency in both directions; m = min(Γ(c) ∪ {c})
        adj = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = (
            adj.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", F.col("u")).alias("m"))
        )
        e1 = (
            adj.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            # m < v always (m ≤ u < v): canonical orientation is (m, v).
            # NOT distinct-ed (r9): the small-star consumers are a MIN
            # aggregate (duplicate-invariant) and a join whose output
            # lands under e2's distinct — the per-round dedup exchange
            # bought nothing but an AQE stage-job per round.
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
        )
        # small-star: centers are the LARGER endpoints (canonical v);
        # m = min of their smaller neighborhoods (all n < c, so
        # min(N ∪ {c}) = min(N))
        centers = e1.select(F.col("v").alias("c"), F.col("u").alias("n"))
        smin = centers.groupBy("c").agg(F.min("n").alias("m"))
        e2 = (
            centers.join(smin, "c")
            .filter(F.col("n") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("n").alias("v"))
            .union(smin.select(F.col("m").alias("u"), F.col("c").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        # Convergence probe, restructured for job count (r9): the old
        # form paid two counts + an exceptAll EVERY round. Now the
        # previous round's count is carried in a Python variable (its
        # job was already paid as THIS round's count), and the equality
        # probe — both edge lists are canonical DISTINCT sets, so
        # equal counts + no (u, v) key appearing on only one side ⟺
        # set equality — runs ONLY on rounds where the necessary
        # count-match condition holds, as one single-exchange
        # union→groupBy→singleton-key existence check. Still EXACT —
        # row-existence proofs, never a hashed checksum that could
        # silently accept a collision.
        n2 = e2.count()
        converged = n2 == prev_n and (
            e2.union(e)
            .groupBy("u", "v")
            .count()
            .filter(F.col("count") == 1)
            .limit(1)
            .count()
            == 0
        )
        e, prev_n = e2, n2
        if converged:
            break
    else:
        raise RuntimeError(
            f"alternating-star did not converge in {max_iterations} "
            "rounds — not expected for any graph below 2^"
            f"{max_iterations // 2} nodes; inspect the edge list"
        )
    # fixpoint is a union of min-rooted stars: (root, leaf) per leaf
    return (
        e.select(F.col("v").alias("id"), F.col("u").alias("component"))
        .union(e.select(F.col("u").alias("id"), F.col("u").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def dedup_clusters_exact(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact-Jaccard dedup clusters with identical-set contraction.

    Same result as ``dedup_clusters(docs, jaccard_pairs(docs, ...))``
    but fused: documents whose token SETS are identical (after the
    same distinct+lower normalization jaccard_pairs applies) are
    contracted to one representative — the group's min id — BEFORE
    the quadratic similarity mining, because identical sets have
    Jaccard 1 with each other and identical Jaccard to every third
    set. The expensive pair mining and the iterative components run
    on representatives only; members inherit their representative's
    component. Exactness argument:

    - within a group every pair has J = 1 ≥ threshold, so the group is
      connected in the full pair graph (the contraction loses nothing);
    - for docs i, j in different groups, J(i, j) = J(rep_i, rep_j), so
      a cross edge exists in the full graph iff the rep edge exists;
    - the component label is the min doc id reachable, and every doc's
      rep is ≤ it, so min-over-reps = min-over-docs in each component.

    Group key is the full sorted token array encoded to 128 bits (md5
    of the JSON encoding), so two DIFFERENT token arrays never share a
    fingerprint in practice (md5 birthday odds ≪ 1e-18 at 10^12 docs
    — a 64-bit set fingerprint would not clear that bar). One honest
    caveat since _jaccard_base hashes the tokens themselves to 64
    bits: "identical sets" means identical HASHED sets. That is the
    same identity every downstream consumer uses — the mining and
    verify Jaccards operate on the same hashed tokens, so a
    vocabulary collision affects contraction and pairwise mining
    consistently (the contraction stays exact w.r.t. the pipeline's
    similarity semantics), and a collision only changes a RESULT when
    two documents differ exactly by a colliding word pair — the
    per-pair 2⁻⁶⁴ trade documented at _jaccard_base.

    Scale notes: the contraction costs one (block, fingerprint)
    shuffle of id-sized rows; it removes the duplicate mass (the bulk
    of a crawl corpus) from the O(n²)-within-block mining AND from the
    components' per-round joins — the denser the duplication, the
    bigger the win. Empty-token docs are excluded from mining (J is
    NULL against everything, matching the SQL semantics 0/0 → NULL)
    and come back as singletons.
    """
    from .dedup import _jaccard_base, _jaccard_pairs_from_base

    base = (
        _jaccard_base(docs, block_col, text_col, id_col)
        .filter(F.size("_tok") > 0)
        .withColumn("_fp", F.md5(F.to_json(F.array_sort("_tok"))))
        .persist()
    )
    grp = base.groupBy("_blk", "_fp").agg(F.min("_id").alias("_rep"))
    doc_rep = base.select("_id", "_blk", "_fp").join(grp, ["_blk", "_fp"])
    rep_base = (
        base.join(grp, ["_blk", "_fp"])
        .filter(F.col("_id") == F.col("_rep"))
        .select("_id", "_blk", "_tok")
    )
    rep_pairs = _jaccard_pairs_from_base(rep_base, threshold)
    comp = connected_components(rep_pairs, src="id_a", dst="id_b")
    doc_comp = doc_rep.join(comp, doc_rep._rep == comp.id, "left").select(
        F.col("_id").alias("_doc"),
        F.coalesce("component", F.col("_rep")).alias("component"),
    )
    w = Window.partitionBy("component")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(doc_comp, F.col("doc_id") == doc_comp._doc, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("component"))
    )


def dedup_clusters_auto(
    docs: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    dup_ratio_threshold: float = 3.0,
) -> DataFrame:
    """Cost-based front door for exact-Jaccard dedup clustering.

    The pairwise path (mine all pairs → components) is fastest on
    mostly-distinct corpora but its pair list grows QUADRATICALLY with
    duplication — replicating a corpus 10× turned 759k pairs into 76M
    and OOM'd the local harness (SCALE.md). The contraction path
    (`dedup_clusters_exact`) is duplication-invariant but pays extra
    fingerprint shuffles that don't amortize when documents are mostly
    unique. One cheap probe — corpus rows vs distinct normalized token
    sets — measures the duplication ratio and picks: ratio ≥
    ``dup_ratio_threshold`` → contraction; below → pairwise. Results
    are identical either way (equality-tested + property-fuzzed), so
    the choice is purely physical, like every other auto strategy
    here.
    """
    from .dedup import _jaccard_base, _jaccard_pairs_from_base

    base = _jaccard_base(docs, block_col, text_col, id_col).filter(
        F.size("_tok") > 0
    )
    n_docs, n_sets = (
        base.agg(
            F.count("*").alias("n"),
            F.count_distinct(
                "_blk", F.md5(F.to_json(F.array_sort("_tok")))
            ).alias("s"),
        ).first()
    )
    if n_sets and n_docs / n_sets >= dup_ratio_threshold:
        return dedup_clusters_exact(docs, block_col, text_col, id_col, threshold)
    # the probe aggregate above tokenized+hashed the corpus once to
    # make its decision; the mining path below re-derives the token
    # relation (persisting base inside _jaccard_pairs_from_base), so
    # each dedup_clusters_auto call pays ONE extra corpus scan for the
    # routing decision — the same bounded probe cost jaccard_pairs'
    # strategy pick pays, counted in the benchmarks
    pairs = _jaccard_pairs_from_base(base, threshold)
    return dedup_clusters(docs, pairs, id_col=id_col)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Full-corpus keep/drop decision from near-dup pairs.

    Returns one row per document: its duplicate-cluster id (min doc id
    in the component; singletons are their own cluster), the cluster
    size, and ``keep`` — true exactly for the cluster's canonical
    (minimum-id) member. ``docs.filter(col('keep'))`` is the deduped
    corpus.
    """
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    w = Window.partitionBy("component")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("component"))
    )


def cluster_representatives(
    docs: DataFrame,
    clusters: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-argmax representative per near-dup cluster: instead of
    the keep-the-min-id rule, elect the best copy of each duplicate
    cluster — ordered by distinct-token ratio (boilerplate-heavy
    copies score low), then ``n_chars``, then id as the deterministic
    tiebreak (a total order, so results are engine- and
    partitioning-independent; the ratio is one IEEE division of two
    small ints, bit-identical cross-engine).

    ``clusters`` is the ``dedup_clusters_auto`` / ``dedup_clusters``
    output (carrying ``id_col``) or raw ``connected_components``
    output (whose node column is named ``id`` — normalized here).
    ``docs`` needs ``id_col`` and ``text_col``; a ``n_chars`` column
    is used as the length tiebreak when present, else derived as
    ``length(text)``. Returns ``(component, rep_doc_id, cluster_size,
    n_dropped)``. Scale: one id-keyed join to attach quality and one
    component-keyed window — the same shuffle key profile the
    clustering output already has."""
    if id_col not in clusters.columns and "id" in clusters.columns:
        clusters = clusters.withColumnRenamed("id", id_col)
    n_chars = (
        F.col("n_chars")
        if "n_chars" in docs.columns
        else F.length(F.col(text_col))
    )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    qual = docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("_uniq_ratio"),
    )
    wsz = Window.partitionBy("component")
    wrn = Window.partitionBy("component").orderBy(
        F.desc("_uniq_ratio"), F.desc("n_chars"), F.asc(id_col)
    )
    return (
        clusters.select(id_col, "component")
        .join(qual, id_col)
        .withColumn("cluster_size", F.count("*").over(wsz))
        .withColumn("_rn", F.row_number().over(wrn))
        .filter(F.col("_rn") == 1)
        .select(
            "component",
            F.col(id_col).alias("rep_doc_id"),
            "cluster_size",
            (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
        )
    )


def pagerank_scaled(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank (Page et al. 1999) in EXACT scaled-integer
    arithmetic: ranks are BIGINTs out of ``scale``, every transfer is
    ``(rank·w) DIV out_weight`` and the damping mix is
    ``((100−d)·(scale DIV N)) DIV 100 + (d·Σin) DIV 100`` — all
    integer operations on positive values, so any engine and any
    partitioning produces bit-identical ranks (the float formulation
    would drift per-iteration across aggregation orders; see the MMR
    rounding lesson in operators/retrieval.py:_cos6i). The truncation
    mass lost to integer division is deterministic and identical
    everywhere — this computes a *defined integer recurrence*, not an
    approximation of the real-valued one.

    ``iterations`` is a small fixed constant, so the power iteration
    unrolls into a static DataFrame plan — one edge-keyed join + one
    dst-keyed aggregate per round, the textbook distributed PageRank
    shape. Nodes are the edge endpoints (for an undirected graph every
    node has out-edges, so no dangling-mass term). Returns
    ``(node, rank_i)`` with ``rank_i`` the scaled BIGINT rank.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # non-positive weights would zero a node's out-weight sum — the
    # per-edge transfer then divides by zero (a hard error under ANSI
    # mode); they carry no rank anyway, so drop them at the door
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.alias("_w")
    ).filter(F.col("_w") > 0)
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_wsum"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    stats = nodes.groupBy().agg(F.count("*").alias("_n"))
    d, scale = int(damping_pct), int(scale)
    base = f"(({100 - d} * ({scale} DIV _n)) DIV 100)"
    p = nodes.crossJoin(F.broadcast(stats)).select(
        "node", F.expr(f"{scale} DIV _n").alias("_r")
    )
    for _ in range(int(iterations)):
        inc = (
            e.join(p.withColumnRenamed("node", "_src"), "_src")
            .join(outw, "_src")
            .select("_dst", F.expr("(_r * _w) DIV _wsum").alias("_t"))
            .groupBy("_dst")
            .agg(F.sum("_t").alias("_s"))
        )
        p = (
            nodes.crossJoin(F.broadcast(stats))
            .join(inc.withColumnRenamed("_dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"{base} + ({d} * COALESCE(_s, CAST(0 AS BIGINT))) DIV 100"
                ).alias("_r"),
            )
        )
    return p.select("node", F.col("_r").alias("rank_i"))
