"""Cross-round bench regression report.

Compares the current ``BENCH_TIMES.json`` (written by every bench.py
run since round 6 — the durable per-query sidecar) against a prior
round's numbers: either another BENCH_TIMES-style file or a driver
``BENCH_r{N}.json`` capture (whose ``tail`` holds a possibly
head-clipped JSON line — parsed best-effort by regex, the reason the
sidecar exists).

Run:  python tools/compare_bench.py [old] [new ...]
Defaults: old = the most recent BENCH_r*.json, new = BENCH_TIMES.json.
Prints a markdown table of shared queries with ratio new/old, sorted
worst-first, plus totals over the shared subset.

MULTIPLE new files fold element-wise into per-query MINIMA before the
comparison (the SCALE.md r8 recommendation: min-of-captures cancels
the co-tenant drift the loadavg gate can't see — two same-code
captures measured 1.06-1.11x apart uniformly). Folding is refused
when the captures' ``git_head`` stamps differ (that would mix code
eras and hide a regression behind an old capture's minimum);
unstamped captures fold with a warning.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_times(
    path: str,
) -> tuple[dict[str, float], float | None, str | None]:
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
        return (
            {k: float(v) for k, v in data["queries"].items()},
            load,
            data.get("git_head"),
        )
    # driver capture: parse whatever "name": seconds pairs survive in
    # the clipped tail
    tail = data.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
    skip = {"metric", "value", "sf", "loadavg"}
    return {k: float(v) for k, v in pairs if k not in skip}, None, None


def fold_minima(
    paths: list[str],
) -> tuple[dict[str, float], float | None]:
    """Element-wise per-query minimum over several captures of the
    SAME code era (git_head must agree where stamped); the folded
    loadavg is the minimum of the capture maxima — the gate question
    is 'was at least one capture idle', since the min of an idle and
    a loaded run of identical code is the idle run's number."""
    heads = set()
    merged: dict[str, float] = {}
    loads = []
    for p in paths:
        times, load, head = load_times(p)
        if head is None:
            print(f"note: {os.path.basename(p)} has no git_head stamp")
        else:
            heads.add(head)
        if load is not None:
            loads.append(load)
        for k, v in times.items():
            merged[k] = min(v, merged.get(k, v))
    if len(heads) > 1:
        raise SystemExit(
            "refusing to fold captures from different code eras "
            f"(git_head values: {sorted(h[:12] for h in heads)}) — "
            "a min across code versions hides regressions"
        )
    return merged, (min(loads) if loads else None)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    default_old = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    old_path = args[0] if args else (default_old[-1] if default_old else None)
    new_paths = (
        args[1:] if len(args) > 1 else [os.path.join(REPO, "BENCH_TIMES.json")]
    )
    if not old_path or not all(os.path.exists(p) for p in new_paths):
        raise SystemExit("need an old BENCH_r*.json and BENCH_TIMES.json")
    old, old_load, _ = load_times(old_path)
    new, new_load = fold_minima(new_paths)
    if len(new_paths) > 1:
        print(
            f"new = element-wise min over {len(new_paths)} same-era "
            "captures: "
            + ", ".join(os.path.basename(p) for p in new_paths)
        )
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
    new_label = "+".join(os.path.basename(p) for p in new_paths)
    print(f"old: {os.path.basename(old_path)}  new: "
          f"{new_label}  shared: {len(shared)}")
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
