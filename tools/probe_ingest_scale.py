"""Scale probe for the incremental ingest-state family (VERDICT r5 #8).

For each ingest module (BM25 index, DSIR buckets, line dedup, PSI
cells, winnow index, count-min sketch): stage the documents corpus as
3 equal hash-split JSONL waves, drain them one at a time, and record
EACH drain's wall-clock. The claim under test: per-drain cost tracks
the BATCH size, not the accumulated STATE size — so within one replay
wave 3 (state holds 2/3 of the corpus) should cost about the same as
wave 1 (empty state), and a 10x corpus should move per-drain cost with
the 10x batch, not with state growth.

Run:  python tools/probe_ingest_scale.py [sf_dir ...]
Prints one markdown table row per (family, sf): the three per-drain
times plus the wave3/wave1 ratio.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from music_streaming_data_pipeline_v2_spark.session import get_spark


def _stage_jsonl(df, staged: str, waves: int, key_col: str = "doc_id"):
    """Hash-split df into ``waves`` JSONL file groups under ``staged``."""
    key = F.pmod(F.hash(key_col), F.lit(waves))
    out = []
    for w in range(waves):
        wdir = os.path.join(staged, f"w{w}")
        df.filter(key == w).repartition(4).write.mode("overwrite").json(wdir)
        files = []
        for i, part in enumerate(
            sorted(glob.glob(os.path.join(wdir, "*.json")))
        ):
            dst = os.path.join(staged, f"docs_w{w}_{i}.jsonl")
            shutil.move(part, dst)
            files.append(dst)
        out.append(files)
    return out


def probe_family(
    spark, name: str, df, run, work_root: str, key_col: str = "doc_id"
) -> list[float]:
    """Stage 3 waves of ``df`` and time each ``run(spark, in_dir,
    work_dir)`` drain separately."""
    base = os.path.join(work_root, name)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir, exist_ok=True)
    waves = _stage_jsonl(df, os.path.join(base, "staged"), 3, key_col)
    work = os.path.join(base, "work")
    times = []
    for files in waves:
        for f in files:
            shutil.move(f, in_dir)
        t0 = time.monotonic()
        run(spark, in_dir, work)
        times.append(round(time.monotonic() - t0, 2))
    return times


def main() -> None:
    from music_streaming_data_pipeline_v2_spark.operators.packing import (
        lineify_tokens,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.dsir_ingest import (
        run_incremental_dsir,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.index_ingest import (
        run_incremental_index,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.line_ingest import (
        run_incremental_line_dedup,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.psi_ingest import (
        run_incremental_psi,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.sketch_ingest import (
        run_incremental_sketch,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.hll_ingest import (
        run_incremental_hll,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.overlap_ingest import (
        run_incremental_overlap,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.winnow_ingest import (
        run_incremental_winnow,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.cap_ingest import (
        run_incremental_cap,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.decontam_ingest import (
        init_decontam_state,
        run_incremental_decontam,
    )
    from music_streaming_data_pipeline_v2_spark.operators.sampling import (
        hash_bucket,
    )

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("ingest-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| family | sf | wave1 | wave2 | wave3 | wave3/wave1 |")
    print("|---|---|---|---|---|---|")
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        dt = docs.select("doc_id", "text").localCheckpoint()
        families = [
            ("index", dt, run_incremental_index),
            ("dsir", dt, run_incremental_dsir),
            (
                "linededup",
                docs.select(
                    "doc_id", lineify_tokens("text", 10).alias("text")
                ).localCheckpoint(),
                run_incremental_line_dedup,
            ),
            (
                "psi",
                docs.select("doc_id", "text", "source").localCheckpoint(),
                run_incremental_psi,
            ),
            ("winnow", dt, run_incremental_winnow),
            ("sketch", dt, run_incremental_sketch),
            (
                "overlap",
                docs.select("doc_id", "text", "source").localCheckpoint(),
                run_incremental_overlap,
            ),
            (
                "hll",
                docs.select(
                    F.col("source").alias("group"),
                    F.col("doc_id").cast("string").alias("key"),
                ).localCheckpoint(),
                run_incremental_hll,
            ),
            (
                "cap",
                docs.select("doc_id", "text", "source").localCheckpoint(),
                lambda spark, in_dir, work: run_incremental_cap(
                    spark, in_dir, work, 15
                ),
            ),
            (
                # the eval-set firewall: train side = the hash-split
                # train bucket streaming in; pinned eval grams
                # initialized OUTSIDE the timed drains (one-time
                # setup cost must not inflate wave 1 — the probe's
                # whole point is the wave3/wave1 ratio). Claim:
                # per-drain cost tracks the BATCH (join vs a FIXED
                # gram set) — state growth is irrelevant by
                # construction.
                "decontam",
                docs.select("doc_id", "text", "source")
                .filter(hash_bucket("doc_id") < 204)
                .localCheckpoint(),
                run_incremental_decontam,
            ),
        ]
        for name, df, run in families:
            work_root = tempfile.mkdtemp(prefix=f"probe_{name}_")
            if name == "decontam":
                # one-time state init, untimed (probe_family times
                # each run() call; init in the first call would
                # deflate the wave3/wave1 ratio under test)
                init_decontam_state(
                    spark,
                    os.path.join(work_root, name, "work"),
                    docs.select("doc_id", "text", "source").filter(
                        hash_bucket("doc_id") >= 230
                    ),
                    n=5,
                )
            try:
                t = probe_family(
                    spark,
                    name,
                    df,
                    run,
                    work_root,
                    key_col="key" if name == "hll" else "doc_id",
                )
            finally:
                shutil.rmtree(work_root, ignore_errors=True)
            ratio = round(t[2] / t[0], 2) if t[0] else float("nan")
            print(
                f"| {name} | {sf} | {t[0]} s | {t[1]} s | {t[2]} s "
                f"| {ratio} |"
            )


if __name__ == "__main__":
    main()
