"""The composed training-data curation recipe, end to end.

Every stage here is an operator this package already proves
individually (near-dup clustering, quality-argmax representatives,
cluster-granular splits, UniMax allocation, epoch mixing — see
operators/clustering.py, operators/sampling.py); this module wires
them into ONE DataFrame plan so the *composition contract* is a
first-class, oracle-checkable query rather than an un-oracled demo
script. Reference scope: the reference repo has no curation surface —
this is part of the LLM-data extension the engine adds on top of its
query surface.

Pipeline (the canonical order a 100 TB curation run uses):

1. near-dup clustering   — exact-Jaccard connected components,
                           cost-based pairwise/contraction routing
2. representatives       — keep the QUALITY-argmax copy per cluster
                           (distinct-token ratio, then length, then id)
3. quality gate          — minimum token count + minimum distinct-token
                           ratio, both in exact integer arithmetic
4. leakage-safe split    — train/val/test coined on the near-dup
                           COMPONENT id, so surviving near-duplicates
                           can never straddle splits
5. UniMax allocation     — one total token budget water-filled across
                           sources with a repeat-epoch cap (train only)
6. epoch mix             — per-document repeat counts hitting each
                           source's allocation (whole epochs + the
                           hash-ordered remainder prefix)

Scale shape: stages 1-2 are the clustering's own shuffle profile
(component-keyed); stage 3 is map-only; stage 4 adds one map-side hash;
stages 5-6 reduce to a source-count-sized broadcast plus one
source-keyed window — no stage introduces a new corpus-sized shuffle
beyond what clustering already paid. The shared post-split relation is
localCheckpointed because three consumers (allocation, mix, final
projection) would otherwise each re-run the clustering subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_recipe(
    docs: DataFrame,
    total_budget: int,
    max_epochs: int,
    *,
    jaccard_threshold: float = 0.8,
    min_tokens: int = 20,
    min_uniq_permille: int = 320,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "lang",
) -> DataFrame:
    """Run the full curation recipe over ``docs``; returns one row per
    document that SURVIVES dedup + the quality gate:
    ``(doc_id, component, source, split, n_tokens, repeat_count)`` —
    ``repeat_count`` is the training-mix repeat for train-split rows
    and 0 for val/test (held-out data is never epoched).

    The quality gate is exact integer arithmetic on both sides of the
    comparison — ``1000·distinct_tokens ≥ min_uniq_permille·tokens``
    instead of a float-ratio threshold — so gate membership is
    engine- and partitioning-invariant (the float ratio itself is only
    used as an ORDER key upstream, where IEEE-exactness suffices).
    """
    from .clustering import dedup_clusters_auto

    cc = dedup_clusters_auto(
        docs, block_col, text_col, id_col, jaccard_threshold
    ).select(id_col, "component")
    return curation_from_components(
        docs,
        cc,
        total_budget,
        max_epochs,
        min_tokens=min_tokens,
        min_uniq_permille=min_uniq_permille,
        text_col=text_col,
        id_col=id_col,
        source_col=source_col,
    )


def curation_split(
    docs: DataFrame,
    components: DataFrame,
    *,
    min_tokens: int = 20,
    min_uniq_permille: int = 320,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Representatives → gate → component-coined split over a
    precomputed ``(id, component)`` relation — the recipe MIDDLE,
    exposed so audits (the per-stage funnel) and the full recipe tail
    share one definition of "what survives to which split".
    Documents absent from ``components`` are singletons."""
    from .clustering import cluster_representatives
    from .packing import engine_safe_tokens
    from .sampling import dataset_split

    cc = (
        docs.select(F.col(id_col))
        .join(components.select(id_col, "component"), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )
    reps = cluster_representatives(
        docs, cc, text_col=text_col, id_col=id_col
    )
    kept = docs.join(
        reps.select(F.col("rep_doc_id").alias(id_col), "component"), id_col
    )
    # greatest(size, 0): a null-text doc tokenizes to size -1 (legacy)
    # or NULL — either way it must fail the gate, not corrupt it
    lower_toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    gated = (
        kept.withColumn(
            "n_tokens",
            F.greatest(
                F.size(engine_safe_tokens(text_col)).cast("long"), F.lit(0)
            ),
        )
        .withColumn("_nd", F.size(F.array_distinct(lower_toks)).cast("long"))
        .withColumn("_nw", F.size(lower_toks).cast("long"))
        .filter(
            (F.col("n_tokens") >= F.lit(int(min_tokens)))
            & (
                F.lit(1000) * F.col("_nd")
                >= F.lit(int(min_uniq_permille)) * F.col("_nw")
            )
        )
    )
    # split coined on the COMPONENT id (leakage_safe_split semantics)
    return dataset_split(gated, "component")


def curation_from_components(
    docs: DataFrame,
    components: DataFrame,
    total_budget: int,
    max_epochs: int,
    *,
    min_tokens: int = 20,
    min_uniq_permille: int = 320,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "lang",
) -> DataFrame:
    """The recipe TAIL over a PRECOMPUTED ``(id, component)`` relation
    — representatives → gate → split → UniMax → epoch mix. Split out
    of ``curation_recipe`` so the expensive clustering can come from
    anywhere that produces components: the batch exact-Jaccard router
    (``curation_recipe``), the alternating-star path, or the
    incrementally maintained near-dup pair state
    (streaming/curation_ingest.py — where the O(new×all) mining
    happened at ingest and query time only pays components over the
    pair list plus this bounded tail). Documents absent from
    ``components`` are singletons (their own component)."""
    from .sampling import epoch_mix_plan, unimax_plan

    split = curation_split(
        docs,
        components,
        min_tokens=min_tokens,
        min_uniq_permille=min_uniq_permille,
        text_col=text_col,
        id_col=id_col,
    )
    # three consumers below — materialize once instead of re-running
    # the clustering subtree per consumer
    split = split.localCheckpoint(eager=False)
    train = split.filter(F.col("split") == "train")
    alloc = unimax_plan(
        train,
        total_budget,
        max_epochs,
        text_col=text_col,
        source_col=source_col,
    )
    budgets = alloc.select(
        "source", F.col("alloc_tokens").alias("budget_tokens")
    )
    plan = epoch_mix_plan(
        train,
        budgets=budgets,
        text_col=text_col,
        id_col=id_col,
        source_col=source_col,
    )
    return (
        split.select(
            F.col(id_col),
            "component",
            F.col(source_col).alias("source"),
            "split",
            "n_tokens",
        )
        .join(plan.select(F.col(id_col), "repeat_count"), id_col, "left")
        .withColumn(
            "repeat_count",
            F.coalesce("repeat_count", F.lit(0).cast("long")),
        )
    )
