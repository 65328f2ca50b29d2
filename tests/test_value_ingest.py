"""Per-group value-cell ingest ≡ the batch robust-stats operators over
the concatenated corpus (cell addition is exact integer math; the
readouts are the shared back-half code)."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
    grouped_histogram_quantiles,
    mad_outlier_stats,
)
from music_streaming_data_pipeline_v2_spark.streaming.value_ingest import (
    query_mad_stats,
    query_value_quantiles,
    run_incremental_values,
)


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for rid, grp, value in rows:
            fh.write(json.dumps({"id": rid, "grp": grp, "value": value}) + "\n")


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_rows(rng, start, n):
    rows = []
    for i in range(n):
        grp = f"g{rng.randrange(3)}"
        v = (
            None
            if rng.random() < 0.05
            else round(rng.uniform(0.0, 60.0), 2)
        )
        if rng.random() < 0.03 and v is not None:
            v += 500.0  # planted outliers
        rows.append((start + i, grp, v))
    return rows


def test_value_ingest_matches_batch(spark, tmp_path):
    rng = random.Random(2026)
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    w1 = _mk_rows(rng, 0, 120)
    w2 = _mk_rows(rng, 1000, 80)

    def batch_df(rows):
        df = spark.createDataFrame(rows, "id long, grp string, value double")
        return df

    _write_wave(inp / "w1.jsonl", w1)
    run_incremental_values(spark, str(inp), work)
    assert _vals(query_mad_stats(spark, work)) == _vals(
        mad_outlier_stats(batch_df(w1), "grp", "value")
    )

    _write_wave(inp / "w2.jsonl", w2)
    run_incremental_values(spark, str(inp), work)
    both = batch_df(w1 + w2)
    assert _vals(query_mad_stats(spark, work)) == _vals(
        mad_outlier_stats(both, "grp", "value")
    )
    # quantile readout over the same cells ≡ the batch grouped form
    # over the centi-scaled values (the scaling the cells store)
    centi = both.filter(F.col("value").isNotNull()).select(
        "grp", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    want_q = _vals(
        grouped_histogram_quantiles(centi, "vc", "grp", [250, 500, 750])
    )
    assert _vals(query_value_quantiles(spark, work, [250, 500, 750])) == want_q


def test_value_ingest_replay_noop(spark, tmp_path):
    rng = random.Random(7)
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", _mk_rows(rng, 0, 60))
    run_incremental_values(spark, str(inp), work)
    before = _vals(query_mad_stats(spark, work))
    run_incremental_values(spark, str(inp), work)  # nothing new
    assert _vals(query_mad_stats(spark, work)) == before


def test_value_ingest_empty_state(spark, tmp_path):
    work = str(tmp_path / "work")
    assert query_mad_stats(spark, work).count() == 0
    assert query_value_quantiles(spark, work, [500]).count() == 0
