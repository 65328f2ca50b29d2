"""Incremental token-length histogram cells at ingest ≡ batch
histogram_quantiles over the same rows; replays are no-ops."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.aggregates import (
    histogram_quantiles,
)
from music_streaming_data_pipeline_v2_spark.operators.packing import (
    engine_safe_tokens,
)
from music_streaming_data_pipeline_v2_spark.streaming.hist_ingest import (
    query_quantiles,
    run_incremental_hist,
)

QS = [100, 250, 500, 750, 900, 1000]

WAVE1 = [
    (0, "a b c"),
    (1, "one two three four five six"),
    (2, "x"),
    (3, ""),
]
WAVE2 = [
    (10, "lorem ipsum dolor sit amet"),
    (11, "w " * 40),
    (12, "solo"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text in rows:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")


def _batch(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lens = df.select(
        F.greatest(
            F.size(engine_safe_tokens("text")).cast("long"), F.lit(0)
        ).alias("n")
    )
    return histogram_quantiles(lens, "n", QS)


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_hist_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", WAVE1)
    run_incremental_hist(spark, str(inp), work)
    assert _vals(query_quantiles(spark, work, QS)) == _vals(
        _batch(spark, WAVE1)
    )

    _write_wave(inp / "w2.jsonl", WAVE2)
    run_incremental_hist(spark, str(inp), work)
    both = _batch(spark, WAVE1 + WAVE2)
    assert _vals(query_quantiles(spark, work, QS)) == _vals(both)

    # replay with no new files: a no-op
    run_incremental_hist(spark, str(inp), work)
    assert _vals(query_quantiles(spark, work, QS)) == _vals(both)


def test_hist_query_on_empty_state(spark, tmp_path):
    # undrained state: the quantile spine comes back with NULL values,
    # matching the batch operator's empty-input contract
    rows = query_quantiles(spark, str(tmp_path / "none"), QS).collect()
    assert len(rows) == len(QS)
    assert all(r.value is None for r in rows)
