"""Scale probe for the comps/ label-delta maintenance (VERDICT r7 #3).

The r7 layout rewrote the WHOLE labeling every maintained drain, so
per-drain write cost grew with accumulated state. The r8 delta layout
must write only the rows a drain CHANGED. This probe makes the
distinction observable: 3 CSV waves, each adding the same number of
brand-new near-dup pairs (disjoint vocabularies — waves never merge
with older components), so

- total labeled ids grow 3x across the run, while
- touched components per drain stay CONSTANT.

Recorded per drain: wall-clock, the comps/ partition's ROW COUNT
(the delta-boundedness witness: constant under the new layout,
growing under the old), and the cumulative labeled-id count.

Run:  python tools/probe_comps_delta.py [pairs_per_wave] [waves]
Prints one markdown table row per drain.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.session import get_spark

MINER = dict(jaccard_threshold=0.4, num_hashes=16, bands=8, shingle_k=2)


def _wave_rows(wave: int, pairs: int) -> list[tuple[int, str, str]]:
    rows = []
    for p in range(pairs):
        base = [f"p{p}w{wave}t{i}" for i in range(12)]
        a = " ".join(base)
        b = " ".join(base[:-1] + [f"p{p}w{wave}alt"])
        did = (wave * pairs + p) * 2
        rows.append((did, "en", a))
        rows.append((did + 1, "en", b))
    return rows


def main() -> None:
    from music_streaming_data_pipeline_v2_spark.streaming.dedup_ingest import (
        run_incremental_dedup,
    )
    from music_streaming_data_pipeline_v2_spark.streaming.state import (
        latest_batch_id,
        read_resolved_labels,
    )

    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_comps", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_comps_")
    inp = os.path.join(root, "in")
    work = os.path.join(root, "work")
    os.makedirs(inp)
    print(f"loadavg at start: {[round(x, 2) for x in os.getloadavg()]}")
    print("| drain | wall s | comps delta rows | cumulative labeled ids |")
    print("|---|---|---|---|")
    for w in range(waves):
        path = os.path.join(inp, f"w{w}.csv")
        with open(path, "w") as fh:
            fh.write("doc_id,lang,text\n")
            for did, lang, text in _wave_rows(w, pairs):
                fh.write(f"{did},{lang},{text}\n")
        t0 = time.monotonic()
        run_incremental_dedup(spark, inp, work, **MINER)
        wall = round(time.monotonic() - t0, 2)
        comps = os.path.join(work, "comps")
        bid = latest_batch_id(spark, comps)
        delta_rows = (
            spark.read.schema("id long, component long")
            .parquet(f"{comps}/batch_id={bid}")
            .count()
        )
        total = read_resolved_labels(
            spark, comps, "id long, component long"
        )[0].count()
        print(f"| {w + 1} | {wall} | {delta_rows} | {total} |")


if __name__ == "__main__":
    main()
