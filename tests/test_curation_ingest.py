"""Curation served from incremental near-dup state ≡ the batch recipe
tail over the concatenated corpus with the same (MinHash) miner."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.operators.clustering import (
    connected_components,
)
from music_streaming_data_pipeline_v2_spark.operators.curation import (
    curation_from_components,
)
from music_streaming_data_pipeline_v2_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from music_streaming_data_pipeline_v2_spark.streaming.curation_ingest import (
    query_curation,
)
from music_streaming_data_pipeline_v2_spark.streaming.dedup_ingest import (
    run_incremental_dedup,
)

MINER = dict(jaccard_threshold=0.5, num_hashes=16, bands=8, shingle_k=2)
BUDGET, EPOCHS = 500, 2
GATE = dict(min_tokens=4, min_uniq_permille=100)

WAVE1 = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "the quick brown fox jumps over the lazy cat"),
    (3, "en", "completely different content about spark engines"),
    (4, "en", "short"),
]
WAVE2 = [
    (10, "en", "the quick brown fox jumps over the lazy dog today"),
    (11, "de", "unrelated text about distributed query planning"),
    (12, "de", "ein anderes dokument mit eigenem inhalt und worten"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        fh.write("doc_id,lang,text\n")
        for did, lang, text in rows:
            fh.write(f"{did},{lang},{text}\n")


def _batch_twin(spark, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    pairs = minhash_lsh_pairs(docs, **MINER)
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "component"
    )
    return curation_from_components(docs, comp, BUDGET, EPOCHS, **GATE)


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_curation_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()

    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    assert _vals(
        query_curation(spark, work, BUDGET, EPOCHS, **GATE)
    ) == _vals(_batch_twin(spark, WAVE1))

    _write_wave(inp / "w2.csv", WAVE2)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    both = _batch_twin(spark, WAVE1 + WAVE2)
    got = query_curation(spark, work, BUDGET, EPOCHS, **GATE)
    assert _vals(got) == _vals(both)

    # semantic spot checks on the served result: the near-dup triple
    # {1,2,10} keeps exactly one representative; the too-short doc 4
    # fails the gate; held-out splits are never epoched
    rows = {r.doc_id: r for r in got.collect()}
    assert len({1, 2, 10} & set(rows)) == 1
    assert 4 not in rows
    for r in rows.values():
        if r.split != "train":
            assert r.repeat_count == 0


def test_incremental_curation_replay_noop(spark, tmp_path):
    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    before = _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE))
    run_incremental_dedup(spark, str(inp), work, **MINER)
    assert _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE)) == before


def test_incremental_components_merge_across_waves(spark, tmp_path):
    """The labeling snapshot survives the hard case: a later wave's
    pair BRIDGES two components built in earlier waves, so both old
    labels must remap (CC over the contracted delta graph, never the
    full pair list — dedup_ingest's VERDICT r6 #5 maintenance)."""
    from music_streaming_data_pipeline_v2_spark.streaming.state import (
        read_latest_snapshot,
        read_state_or_empty,
    )

    # single-row bands: candidate recall 1-(1-J)^16 ≈ 1 at J≥0.3,
    # so the bridge pair is mined deterministically
    miner = dict(
        jaccard_threshold=0.25, num_hashes=16, bands=16, shingle_k=2
    )
    t_a = "alpha beta gamma delta epsilon zeta"
    t_b = "one two three four five six seven"
    wave1 = [
        (1, "en", t_a),
        (2, "en", t_a + " eta"),
        (5, "en", t_b),
        (6, "en", t_b + " eight"),
    ]
    # half-and-half text: near-dup of BOTH groups at the 0.3 threshold
    wave2 = [(20, "en", "alpha beta gamma delta one two three four")]

    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", wave1)
    run_incremental_dedup(spark, str(inp), work, **miner)
    snap1, _ = read_latest_snapshot(
        spark, f"{work}/comps", "id long, component long"
    )
    lab1 = dict(_vals(snap1))
    assert lab1[1] == lab1[2] == 1 and lab1[5] == lab1[6] == 5

    _write_wave(inp / "w2.csv", wave2)
    run_incremental_dedup(spark, str(inp), work, **miner)
    snap2, _ = read_latest_snapshot(
        spark, f"{work}/comps", "id long, component long"
    )
    lab2 = dict(_vals(snap2))
    # the bridge collapses everything to the global min id — and the
    # snapshot must equal full CC over the accumulated pair list
    assert lab2[1] == lab2[2] == lab2[5] == lab2[6] == lab2[20] == 1
    pairs = read_state_or_empty(
        spark, f"{work}/pairs", "id_a long, id_b long, jaccard double"
    )
    full = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("id"), "component"
    )
    assert sorted(lab2.items()) == _vals(full)


def test_prune_snapshots_keeps_serving_intact(spark, tmp_path):
    """Old comps/ snapshots are garbage (only the newest is read):
    pruning removes them, serving answers are unchanged, and a
    subsequent drain keeps working from the kept snapshot."""
    from music_streaming_data_pipeline_v2_spark.streaming.state import (
        prune_snapshots,
        read_latest_snapshot,
    )

    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    _write_wave(inp / "w2.csv", WAVE2)
    run_incremental_dedup(spark, str(inp), work, **MINER)

    before = _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE))
    snap_before, bid = read_latest_snapshot(
        spark, f"{work}/comps", "id long, component long"
    )
    labels_before = _vals(snap_before)
    deleted = prune_snapshots(spark, f"{work}/comps")
    assert deleted and all(b < bid for b in deleted)
    snap_after, bid2 = read_latest_snapshot(
        spark, f"{work}/comps", "id long, component long"
    )
    assert bid2 == bid and _vals(snap_after) == labels_before
    assert _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE)) == before
    # pruning again is a no-op
    assert prune_snapshots(spark, f"{work}/comps") == []


def test_maintain_components_false_falls_back(spark, tmp_path):
    """Without label maintenance no comps/ state exists, and serving
    falls back to full CC over the pair list — same answers."""
    import os

    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1 + WAVE2)
    run_incremental_dedup(
        spark, str(inp), work, maintain_components=False, **MINER
    )
    assert not os.path.isdir(os.path.join(work, "comps"))
    assert _vals(
        query_curation(spark, work, BUDGET, EPOCHS, **GATE)
    ) == _vals(_batch_twin(spark, WAVE1 + WAVE2))


def test_stale_snapshot_from_mixed_maintenance_falls_back(spark, tmp_path):
    """A maintenance-DISABLED drain between maintained ones leaves the
    comps/ snapshot lagging the pair state; serving must detect the
    lag (batch-id freshness) and fall back to full CC instead of
    silently dropping the later drain's merges."""
    from music_streaming_data_pipeline_v2_spark.streaming.state import (
        latest_batch_id,
    )

    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)  # maintained
    _write_wave(inp / "w2.csv", WAVE2)
    run_incremental_dedup(
        spark, str(inp), work, maintain_components=False, **MINER
    )
    assert latest_batch_id(spark, f"{work}/comps") < latest_batch_id(
        spark, f"{work}/pairs"
    )
    got = _vals(query_curation(spark, work, BUDGET, EPOCHS, **GATE))
    assert got == _vals(_batch_twin(spark, WAVE1 + WAVE2))


def test_empty_delta_copies_snapshot_forward(spark, tmp_path):
    """A maintained drain with NO new pairs copies the labeling
    forward, so the freshness invariant (comps latest == pairs latest)
    holds and serving stays on the snapshot path."""
    from music_streaming_data_pipeline_v2_spark.streaming.state import (
        latest_batch_id,
        read_latest_snapshot,
    )

    inp = tmp_path / "in"
    work = str(tmp_path / "work")
    inp.mkdir()
    _write_wave(inp / "w1.csv", WAVE1)
    run_incremental_dedup(spark, str(inp), work, **MINER)
    labels1 = _vals(
        read_latest_snapshot(
            spark, f"{work}/comps", "id long, component long"
        )[0]
    )
    # wave of all-unique docs: verified pairs empty
    _write_wave(
        inp / "w2.csv",
        [(50 + i, "en", f"totally unique text number {i} here") for i in range(3)],
    )
    run_incremental_dedup(spark, str(inp), work, **MINER)
    assert latest_batch_id(spark, f"{work}/comps") == latest_batch_id(
        spark, f"{work}/pairs"
    )
    snap, _ = read_latest_snapshot(
        spark, f"{work}/comps", "id long, component long"
    )
    assert _vals(snap) == labels1
