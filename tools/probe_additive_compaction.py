"""Scale probe for additive-cell chain compaction (VERDICT r8 #2).

Every additive ingest family sums ALL ``batch_id=`` partitions at
readout, so readout cost tracks DRAIN COUNT, not state size — fine at
3 drains, linear pain at 10⁴⁻⁵ micro-batches. ``compact_additive_cells``
folds the chain into the newest partition between drains; because cell
addition is associative integer math the folded readout is
bit-identical (pinned by tests/test_state_maintenance.py) while its
cost returns to the cell-space bound.

This probe drives BOTH maintenance modes over identical waves of the
per-group value-cell family and times the MAD readout as the chain
grows: uncompacted readout time should grow with drain count; the
compacted state should stay flat (single folded partition throughout).

Run:  python tools/probe_additive_compaction.py [rows_per_wave] [waves]
Prints one markdown row per measured chain length.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_data_pipeline_v2_spark.session import get_spark


def _write_wave(path: str, start: int, n: int, rng: random.Random) -> None:
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(
                json.dumps(
                    {
                        "id": start + i,
                        "grp": f"g{rng.randrange(8)}",
                        "value": round(rng.uniform(0, 500), 2),
                    }
                )
                + "\n"
            )


def main() -> None:
    from music_streaming_data_pipeline_v2_spark.streaming.value_ingest import (
        query_mad_stats,
        run_incremental_values,
    )

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("probe_compact", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_compact_")
    rng = random.Random(31)
    works = {
        "chain": os.path.join(root, "chain"),
        "compacted": os.path.join(root, "compacted"),
    }
    for w in works.values():
        os.makedirs(os.path.join(w, "in"), exist_ok=True)

    print(f"rows/wave={rows} waves={waves} loadavg={os.getloadavg()}")
    print(
        "| drains | chain parts | chain readout s | compacted parts "
        "| compacted readout s |"
    )
    print("|---|---|---|---|---|")
    staged = os.path.join(root, "staged.jsonl")
    for wave in range(1, waves + 1):
        _write_wave(staged, wave * 1_000_000, rows, rng)
        for mode, wdir in works.items():
            shutil.copy(staged, os.path.join(wdir, "in", f"w{wave}.jsonl"))
            run_incremental_values(
                spark,
                os.path.join(wdir, "in"),
                wdir,
                compact_after_drain=(mode == "compacted"),
            )
        if wave % 5 == 0 or wave == 1:
            times, parts = {}, {}
            for mode, wdir in works.items():
                t0 = time.monotonic()
                # two readouts per measure: min cancels GC noise
                query_mad_stats(spark, wdir).count()
                t1 = time.monotonic() - t0
                t0 = time.monotonic()
                query_mad_stats(spark, wdir).count()
                times[mode] = round(min(t1, time.monotonic() - t0), 3)
                parts[mode] = len(
                    [
                        p
                        for p in os.listdir(os.path.join(wdir, "cells"))
                        if p.startswith("batch_id=")
                    ]
                )
            print(
                f"| {wave} | {parts['chain']} | {times['chain']} "
                f"| {parts['compacted']} | {times['compacted']} |",
                flush=True,
            )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
