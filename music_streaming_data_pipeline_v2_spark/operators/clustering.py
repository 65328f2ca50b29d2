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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id in the node's connected
    component — deterministic regardless of partitioning or iteration
    schedule, so results are exactly reproducible (and oracle-able
    against a recursive-CTE transitive closure).
    """
    # materialize the (possibly expensive) edge-mining plan ONCE before
    # symmetrizing — the union below reads it twice. The distinct also
    # re-partitions the symmetric edge list by content hash, which the
    # per-round joins then reuse from the checkpoint.
    pairs = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
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
    return labels.select("id", F.col("comp").alias("component"))


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
