"""Line-dedup-at-ingest: incremental state ≡ batch dedup_lines over
the same corpus in arrival order; replays are no-ops; all-duplicate
batches are safe (the empty-state-write guard)."""

from __future__ import annotations

import json

from music_streaming_data_pipeline_v2_spark.operators.dedup import dedup_lines
from music_streaming_data_pipeline_v2_spark.streaming.line_ingest import (
    read_deduped_docs,
    read_line_state,
    run_incremental_line_dedup,
)

DOCS_W1 = [
    (0, "alpha beta\ngamma delta\nalpha beta"),
    (1, "gamma delta\nepsilon zeta"),
    (2, "  \nunique to two\n"),
]
DOCS_W2 = [
    (10, "alpha beta\nnew in wave two"),
    (11, "epsilon zeta\nunique to two\nnew in wave two"),
]
DOCS_W3 = [
    # every line already seen → zero new state rows for this batch
    (20, "alpha beta\nunique to two"),
]


def _write_wave(path, rows):
    with open(path, "w") as fh:
        for did, text in rows:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")


def _rows(df):
    return sorted(
        (r.doc_id, r.text, r.n_lines, r.n_dropped) for r in df.collect()
    )


def test_incremental_line_dedup_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    work = tmp_path / "work"
    inp.mkdir()

    _write_wave(inp / "w1.jsonl", DOCS_W1)
    run_incremental_line_dedup(spark, str(inp), str(work))
    got1 = _rows(read_deduped_docs(spark, str(work)))
    want1 = _rows(
        dedup_lines(
            spark.createDataFrame(DOCS_W1, "doc_id long, text string")
        )
    )
    assert got1 == want1

    # wave 2: history decides, but is never re-split
    _write_wave(inp / "w2.jsonl", DOCS_W2)
    run_incremental_line_dedup(spark, str(inp), str(work))
    got2 = _rows(read_deduped_docs(spark, str(work)))
    want2 = _rows(
        dedup_lines(
            spark.createDataFrame(
                DOCS_W1 + DOCS_W2, "doc_id long, text string"
            )
        )
    )
    assert got2 == want2
    # cross-batch drop really happened: doc 10's 'alpha beta' fell
    d10 = {r[0]: r for r in got2}[10]
    assert d10[1] == "new in wave two" and d10[3] == 1

    # wave 3 is ALL duplicates → its docs output is all-dropped and it
    # must not write a _SUCCESS-only lines partition that would poison
    # later state reads
    _write_wave(inp / "w3.jsonl", DOCS_W3)
    run_incremental_line_dedup(spark, str(inp), str(work))
    got3 = _rows(read_deduped_docs(spark, str(work)))
    want3 = _rows(
        dedup_lines(
            spark.createDataFrame(
                DOCS_W1 + DOCS_W2 + DOCS_W3, "doc_id long, text string"
            )
        )
    )
    assert got3 == want3
    d20 = {r[0]: r for r in got3}[20]
    assert d20[1] == "" and d20[2] == 2 and d20[3] == 2

    # replay with no new files: a no-op — state and outputs unchanged
    run_incremental_line_dedup(spark, str(inp), str(work))
    assert _rows(read_deduped_docs(spark, str(work))) == got3
    state = read_line_state(spark, str(work))
    assert state.count() == state.select("line").distinct().count()


def test_line_state_reads_before_any_drain(spark, tmp_path):
    """Undrained work_dir → empty typed relations, not crashes."""
    work = tmp_path / "never_drained"
    assert read_deduped_docs(spark, str(work)).count() == 0
    assert read_line_state(spark, str(work)).count() == 0
