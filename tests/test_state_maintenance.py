"""State-maintenance hardening (VERDICT r8 #2/#6, ADVICE r8):
additive-cell chain compaction serves bit-identical readouts from a
single folded partition; maintenance refuses an in-flight checkpoint;
a torn compaction (crash between delete and rename) heals."""

from __future__ import annotations

import json
import os
import random

import pytest

from music_streaming_data_pipeline_v2_spark.streaming.state import (
    assert_quiesced,
    compact_additive_cells,
    compact_label_deltas,
    latest_batch_id,
    read_state_or_empty,
)
from music_streaming_data_pipeline_v2_spark.streaming.value_ingest import (
    query_mad_stats,
    query_value_quantiles,
    run_incremental_values,
)


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for rid, grp, value in rows:
            fh.write(
                json.dumps({"id": rid, "grp": grp, "value": value}) + "\n"
            )


def _mk_rows(rng, start, n):
    return [
        (
            start + i,
            f"g{rng.randrange(3)}",
            None if rng.random() < 0.05 else round(rng.uniform(0, 60), 2),
        )
        for i in range(n)
    ]


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def _partitions(state_dir):
    return sorted(
        n for n in os.listdir(state_dir) if n.startswith("batch_id=")
    )


def test_compact_additive_cells_identical_readout(spark, tmp_path):
    rng = random.Random(9)
    inp = tmp_path / "in"
    inp.mkdir()
    work = str(tmp_path / "work")
    for w in range(3):
        _write_wave(inp / f"w{w}.jsonl", _mk_rows(rng, 1000 * w, 60))
        run_incremental_values(spark, str(inp), work)
    cells_dir = os.path.join(work, "cells")
    assert len(_partitions(cells_dir)) == 3
    before_mad = _vals(query_mad_stats(spark, work))
    before_q = _vals(query_value_quantiles(spark, work, [250, 500, 750]))

    doomed = compact_additive_cells(
        spark,
        cells_dir,
        "grp string, v long, cnt long",
        key_cols=["grp", "v"],
        sum_cols=["cnt"],
        ckpt_dir=os.path.join(work, "ckpt"),
    )
    assert doomed == [0, 1]
    assert _partitions(cells_dir) == ["batch_id=2"]
    # folded state serves BIT-identical readouts (integer cell sums)
    assert _vals(query_mad_stats(spark, work)) == before_mad
    assert (
        _vals(query_value_quantiles(spark, work, [250, 500, 750]))
        == before_q
    )
    # maintenance is idempotent and further drains keep working
    assert compact_additive_cells(
        spark,
        cells_dir,
        "grp string, v long, cnt long",
        key_cols=["grp", "v"],
        sum_cols=["cnt"],
    ) == []
    _write_wave(inp / "w3.jsonl", _mk_rows(rng, 5000, 40))
    run_incremental_values(spark, str(inp), work, compact_after_drain=True)
    assert _partitions(cells_dir) == ["batch_id=3"]


def test_compact_additive_cells_empty_state(spark, tmp_path):
    assert (
        compact_additive_cells(
            spark,
            str(tmp_path / "nowhere"),
            "grp string, v long, cnt long",
            key_cols=["grp", "v"],
            sum_cols=["cnt"],
        )
        == []
    )


def test_hist_and_psi_compaction(spark, tmp_path):
    from music_streaming_data_pipeline_v2_spark.streaming.hist_ingest import (
        query_quantiles,
        run_incremental_hist,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.psi_ingest import (
        query_psi,
        run_incremental_psi,
    )

    rng = random.Random(17)
    for fam, runner, query in (
        ("hist", run_incremental_hist, None),
        ("psi", run_incremental_psi, None),
    ):
        inp = tmp_path / f"{fam}_in"
        inp.mkdir()
        work = str(tmp_path / f"{fam}_work")
        for w in range(2):
            with open(inp / f"w{w}.jsonl", "w") as fh:
                for i in range(40):
                    fh.write(
                        json.dumps(
                            {
                                "doc_id": w * 1000 + i,
                                "text": " ".join(
                                    "tok%d" % rng.randrange(50)
                                    for _ in range(rng.randrange(3, 30))
                                ),
                                "source": f"s{rng.randrange(3)}",
                            }
                        )
                        + "\n"
                    )
            runner(spark, str(inp), work)
        if fam == "hist":
            before = _vals(query_quantiles(spark, work, [500, 900]))
        else:
            before = _vals(query_psi(spark, work))
        cells_dir = os.path.join(work, "cells")
        assert len(_partitions(cells_dir)) == 2
        if fam == "hist":
            compact_additive_cells(
                spark,
                cells_dir,
                "value long, _cnt long",
                key_cols=["value"],
                sum_cols=["_cnt"],
                ckpt_dir=os.path.join(work, "ckpt"),
            )
            after = _vals(query_quantiles(spark, work, [500, 900]))
        else:
            compact_additive_cells(
                spark,
                cells_dir,
                "grp string, bin string, cnt long",
                key_cols=["grp", "bin"],
                sum_cols=["cnt"],
                ckpt_dir=os.path.join(work, "ckpt"),
            )
            after = _vals(query_psi(spark, work))
        assert len(_partitions(cells_dir)) == 1
        assert after == before


def _fake_ckpt(tmp_path, started, committed):
    ckpt = tmp_path / "fake_ckpt"
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "commits").mkdir(parents=True)
    for b in range(started + 1):
        (ckpt / "offsets" / str(b)).write_text("{}")
    for b in range(committed + 1):
        (ckpt / "commits" / str(b)).write_text("{}")
    return str(ckpt)


def test_assert_quiesced_refuses_inflight(spark, tmp_path):
    ckpt = _fake_ckpt(tmp_path, started=2, committed=1)
    with pytest.raises(ValueError, match="in flight"):
        assert_quiesced(spark, ckpt)
    # commit lands -> quiesced
    with open(os.path.join(ckpt, "commits", "2"), "w") as fh:
        fh.write("{}")
    assert_quiesced(spark, ckpt)
    # absent checkpoint (no stream ever ran) passes
    assert_quiesced(spark, str(tmp_path / "no_ckpt"))


def test_compaction_guard_refuses_inflight(spark, tmp_path):
    rng = random.Random(3)
    inp = tmp_path / "in"
    inp.mkdir()
    work = str(tmp_path / "work")
    _write_wave(inp / "w0.jsonl", _mk_rows(rng, 0, 30))
    run_incremental_values(spark, str(inp), work)
    bad_ckpt = _fake_ckpt(tmp_path, started=1, committed=0)
    cells_dir = os.path.join(work, "cells")
    with pytest.raises(ValueError, match="in flight"):
        compact_additive_cells(
            spark,
            cells_dir,
            "grp string, v long, cnt long",
            key_cols=["grp", "v"],
            sum_cols=["cnt"],
            ckpt_dir=bad_ckpt,
        )
    with pytest.raises(ValueError, match="in flight"):
        compact_label_deltas(
            spark,
            cells_dir,
            "grp string, v long, cnt long",
            key_col="grp",
            ckpt_dir=bad_ckpt,
        )
    # state untouched by the refused calls
    assert len(_partitions(cells_dir)) == 1


def test_torn_compaction_heals(spark, tmp_path):
    """Crash window between delete(batch_id=latest) and rename: the
    complete tmp partition (with _SUCCESS) is renamed in on the next
    maintenance call; a stale tmp whose target survived is discarded."""
    rng = random.Random(5)
    inp = tmp_path / "in"
    inp.mkdir()
    work = str(tmp_path / "work")
    for w in range(2):
        _write_wave(inp / f"w{w}.jsonl", _mk_rows(rng, 1000 * w, 50))
        run_incremental_values(spark, str(inp), work)
    cells_dir = os.path.join(work, "cells")
    want = _vals(query_mad_stats(spark, work))

    # simulate the torn window by hand: fold into tmp, delete target,
    # "crash" before rename
    state = read_state_or_empty(
        spark, cells_dir, "grp string, v long, cnt long"
    )
    from pyspark.sql import functions as F

    folded = state.groupBy("grp", "v").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    latest = latest_batch_id(spark, cells_dir)
    tmp_part = os.path.join(cells_dir, ".compact_tmp", f"batch_id={latest}")
    folded.write.mode("overwrite").parquet(tmp_part)
    import shutil

    shutil.rmtree(os.path.join(cells_dir, f"batch_id={latest}"))

    # next maintenance call heals, then compacts as normal
    compact_additive_cells(
        spark,
        cells_dir,
        "grp string, v long, cnt long",
        key_cols=["grp", "v"],
        sum_cols=["cnt"],
    )
    assert _partitions(cells_dir) == [f"batch_id={latest}"]
    assert not os.path.exists(os.path.join(cells_dir, ".compact_tmp"))
    assert _vals(query_mad_stats(spark, work)) == want

    # stale tmp (target present) is discarded, not renamed in
    bogus = os.path.join(cells_dir, ".compact_tmp", f"batch_id={latest}")
    spark.createDataFrame(
        [("zzz", 1, 99)], "grp string, v long, cnt long"
    ).write.mode("overwrite").parquet(bogus)
    compact_additive_cells(
        spark,
        cells_dir,
        "grp string, v long, cnt long",
        key_cols=["grp", "v"],
        sum_cols=["cnt"],
    )
    assert _vals(query_mad_stats(spark, work)) == want
