"""Semantic-dedup-at-ingest: leader index accumulates across batches,
new arrivals check only against accepted leaders (greedy/leader
semantics incl. the within-batch chain case), replays are no-ops."""

from __future__ import annotations

import json
import math

from music_streaming_data_pipeline_v2_spark.streaming.semantic_ingest import (
    run_incremental_semantic_dedup,
)


def _vec(angle_deg: float) -> list[float]:
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a)]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for vid, emb in rows:
            fh.write(json.dumps({"vec_id": vid, "embedding": emb}) + "\n")


CB = [[1.0, 0.0], [0.0, 1.0]]
TAU = 0.98  # cos 10° ≈ 0.985 passes, cos 20° ≈ 0.940 does not


def test_incremental_semantic_dedup_leader_semantics(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    # wave 1 (all in the <45° cell): v0 at 0° (leader), v1 at 10°
    # (≥ τ of v0 → dropped), v2 at 20° (< τ of the ONLY leader v0;
    # within τ of the DROPPED v1, which must NOT block — the chain
    # case) → kept
    _write_wave(
        inp / "w1.jsonl",
        [(0, _vec(0)), (1, _vec(10)), (2, _vec(20))],
    )
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d1 = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    assert d1 == {0: True, 1: False, 2: True}

    # wave 2: near-replica of the wave-1 leader v0 → dropped against
    # HISTORY; v11 at 28° (vs leader v0: cos 28° ≈ 0.883 < τ; vs
    # leader v2: cos 8° ≈ 0.990 ≥ τ → dropped by v2); and a novel
    # 89° vector → other cell, no leaders there, kept
    _write_wave(
        inp / "w2.jsonl",
        [(10, _vec(1)), (11, _vec(28)), (12, _vec(89))],
    )
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d2 = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    assert d2[10] is False  # replica of history leader
    assert d2[11] is False  # within τ of leader v2
    assert d2[12] is True   # novel, other cell
    # history decisions untouched
    assert {k: d2[k] for k in (0, 1, 2)} == d1

    # leader store holds exactly the kept vectors
    leaders = {
        r.vec_id for r in spark.read.parquet(str(work / "leaders")).collect()
    }
    assert leaders == {0, 2, 12}

    # replay with no new files: nothing changes
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d3 = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    assert d3 == d2
    assert (
        spark.read.parquet(str(work / "decisions")).count() == 6
    )  # no duplicate rows


def test_incremental_semantic_dedup_zero_vector_kept(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(
        inp / "w1.jsonl",
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0])],
    )
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    # zero-norm vectors: always kept, never leaders (batch parity)
    assert d == {0: True, 1: True, 2: True}
    leaders = {
        r.vec_id for r in spark.read.parquet(str(work / "leaders")).collect()
    }
    assert leaders == {0}


def test_incremental_semantic_dedup_empty_first_leaders(spark, tmp_path):
    """A first batch that accepts ZERO leaders (all zero-norm) must not
    poison the leader store: the next batch's leader read has to
    succeed even though no leader data file exists yet (ADVICE r4 —
    schema inference over a data-less partitioned store crashed every
    subsequent batch)."""
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()
    _write_wave(inp / "w1.jsonl", [(0, [0.0, 0.0]), (1, [0.0, 0.0])])
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d1 = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    assert d1 == {0: True, 1: True}

    # wave 2 against the leaderless history: the 0° vector is novel
    # (kept, becomes the first leader); its 10° neighbor in the same
    # batch is chained off it
    _write_wave(inp / "w2.jsonl", [(10, _vec(0)), (11, _vec(10))])
    run_incremental_semantic_dedup(spark, str(inp), str(work), CB, TAU)
    d2 = {
        r.vec_id: r.kept
        for r in spark.read.parquet(str(work / "decisions")).collect()
    }
    assert d2 == {0: True, 1: True, 10: True, 11: False}
    leaders = {
        r.vec_id for r in spark.read.parquet(str(work / "leaders")).collect()
    }
    assert leaders == {10}
