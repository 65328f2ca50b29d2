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
