"""Round-over-round bench delta table.

Compares per-query times between two sets of persisted bench runs
(``bench_results/bench_*_sf0.1.json``), split by a timestamp cutoff.
For each query the per-round time is the MIN across that round's runs
(host noise only inflates, never deflates).  Emits a markdown table of
queries whose min moved by more than ``--flag`` (default 1.5x) in
either direction, with the 1-minute loadavg recorded at each round's
winning run — the adjudication data the round notes need.

Usage:
    python tools/bench_delta.py --cutoff 20260815T100000 [--flag 1.5]
"""

import argparse
import glob
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_round(files):
    best = {}
    load = {}
    for path in files:
        with open(path) as f:
            d = json.load(f)
        la = (d.get("loadavg_1m") or {}).get("per_query") or {}
        for q, sec in (d.get("queries") or {}).items():
            if q not in best or sec < best[q]:
                best[q] = sec
                load[q] = la.get(q)
    return best, load


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cutoff", required=True,
                    help="runs with timestamp < cutoff are 'old', >= are 'new'")
    ap.add_argument("--flag", type=float, default=1.5)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(HERE, "bench_results",
                                          "bench_*_sf0.1.json")))
    old_files = [f for f in files
                 if os.path.basename(f).split("_")[1] < args.cutoff]
    new_files = [f for f in files
                 if os.path.basename(f).split("_")[1] >= args.cutoff]
    if not old_files or not new_files:
        raise SystemExit(f"cutoff splits {len(old_files)}/{len(new_files)} "
                         "runs — need both sides non-empty")

    old, old_la = _load_round(old_files)
    new, new_la = _load_round(new_files)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    moved = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if o <= 0 or n <= 0:
            continue
        ratio = n / o
        if ratio > args.flag or ratio < 1 / args.flag:
            moved.append((q, o, n, ratio, old_la.get(q), new_la.get(q)))

    print(f"old runs: {len(old_files)} ({len(old)} queries), "
          f"new runs: {len(new_files)} ({len(new)} queries)")
    print(f"added: {', '.join(added) if added else 'none'}")
    print(f"removed: {', '.join(removed) if removed else 'none'}")
    print()
    if not moved:
        print(f"No query moved more than {args.flag}x "
              "(min-over-runs, both rounds).")
        return
    print("| query | old min s | new min s | ratio | old load | new load |")
    print("|---|---|---|---|---|---|")
    for q, o, n, r, lo, ln in sorted(moved, key=lambda t: -t[3]):
        print(f"| {q} | {o:.3f} | {n:.3f} | {r:.2f}x | "
              f"{lo if lo is not None else '—'} | "
              f"{ln if ln is not None else '—'} |")


if __name__ == "__main__":
    main()
