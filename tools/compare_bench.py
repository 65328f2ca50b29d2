"""Cross-round bench regression report.

Compares the current ``BENCH_TIMES.json`` (written by every bench.py
run since round 6 — the durable per-query sidecar) against a prior
round's numbers: either another BENCH_TIMES-style file or a driver
``BENCH_r{N}.json`` capture (whose ``tail`` holds a possibly
head-clipped JSON line — parsed best-effort by regex, the reason the
sidecar exists).

Run:  python tools/compare_bench.py [old] [new]
Defaults: old = the most recent BENCH_r*.json, new = BENCH_TIMES.json.
Prints a markdown table of shared queries with ratio new/old, sorted
worst-first, plus totals over the shared subset.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_times(path: str) -> tuple[dict[str, float], float | None]:
    """Returns (per-query seconds, max of the 1- and 5-min loadavg at
    capture start, or None for pre-stamp captures). The 5-min figure
    matters as much as the 1-min one: a capture started right after a
    heavy pytest run can show load1 ≈ 0 while the host is still
    draining (VERDICT r7 probes: semantic_dedup 8.1 s at load1=0.05 /
    load5=3.4 vs 6.8 s at load5=1.2 — a 1.2x artifact the load1-only
    gate admitted)."""
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data and isinstance(data["queries"], dict):
        la = data.get("loadavg")
        load = (
            max(float(x) for x in la[:2])
            if isinstance(la, list) and la
            else None
        )
        return {k: float(v) for k, v in data["queries"].items()}, load
    # driver capture: parse whatever "name": seconds pairs survive in
    # the clipped tail
    tail = data.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    skip = {"metric", "value", "sf", "loadavg"}
    return {k: float(v) for k, v in pairs if k not in skip}, None


def main() -> None:
    default_old = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    old_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else (default_old[-1] if default_old else None)
    )
    new_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH_TIMES.json")
    )
    if not old_path or not os.path.exists(new_path):
        raise SystemExit("need an old BENCH_r*.json and BENCH_TIMES.json")
    old, old_load = load_times(old_path)
    new, new_load = load_times(new_path)
    # A capture that STARTED on a busy host (max of 1- and 5-min
    # loadavg > 2) is not comparable — r6 proved a loaded host shifts
    # every multi-job query 1.2-1.7x with identical code/plans, and r7
    # proved the 5-min residual alone does the same after a pytest
    # run. --force overrides for forensic use; unstamped
    # (pre-round-7) captures pass with a note.
    for label, load in (("old", old_load), ("new", new_load)):
        if load is None:
            print(f"note: {label} capture has no loadavg stamp")
        elif load > 2.0 and "--force" not in sys.argv:
            raise SystemExit(
                f"{label} capture started at max(load1, load5) = {load} "
                "(> 2): comparison would measure host load, not code. "
                "Re-capture idle or pass --force."
            )
    shared = sorted(set(old) & set(new))
    if not shared:
        raise SystemExit("no shared queries between the two captures")
    rows = []
    for q in shared:
        o, n = old[q], new[q]
        rows.append((n / o if o else float("inf"), q, o, n))
    rows.sort(reverse=True)
    print(f"old: {os.path.basename(old_path)}  new: "
          f"{os.path.basename(new_path)}  shared: {len(shared)}")
    print("| query | old s | new s | new/old |")
    print("|---|---|---|---|")
    for r, q, o, n in rows:
        flag = " ⚠" if r > 1.5 else ""
        print(f"| {q}{flag} | {o:.2f} | {n:.2f} | {r:.2f} |")
    to, tn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(
        f"shared-subset totals: old {to:.1f} s, new {tn:.1f} s, "
        f"ratio {tn / to:.2f}; regressions >1.5x: "
        f"{sum(1 for r, *_ in rows if r > 1.5)}"
    )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # |head — not an error
        pass
