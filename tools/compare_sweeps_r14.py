"""Compare two BENCH_spread.json files (round-start vs round-close):
per-query median deltas, biggest movers, and the repo's per-query
regression rule (>1.5x and >+0.5 s).

Usage: python tools/compare_sweeps_r14.py <start_spread> <end_spread>
"""

import json
import statistics
import sys


def med(runs):
    return statistics.median(runs)


def main():
    a = json.load(open(sys.argv[1]))["spread"]
    b = json.load(open(sys.argv[2]))["spread"]
    common = [k for k in a if k in b]
    rows = []
    for k in common:
        ma, mb = med(a[k]["runs"]), med(b[k]["runs"])
        rows.append((mb - ma, ma, mb, k))
    rows.sort()
    ta = sum(r[1] for r in rows)
    tb = sum(r[2] for r in rows)
    print(f"common {len(common)}  start {ta:.1f}s  close {tb:.1f}s  ratio {tb/ta:.3f}")
    improved = sum(1 for r in rows if r[0] < 0)
    print(f"improved {improved} / {len(rows)}")
    print("-- top improvements --")
    for d, ma, mb, k in rows[:15]:
        print(f"  {ma:7.2f} -> {mb:7.2f}  ({d:+6.2f})  {k}")
    print("-- top regressions --")
    for d, ma, mb, k in rows[-15:]:
        print(f"  {ma:7.2f} -> {mb:7.2f}  ({d:+6.2f})  {k}")
    print("-- regression rule (>1.5x and >+0.5s) --")
    flagged = [r for r in rows if r[2] > 1.5 * r[1] and r[0] > 0.5]
    for d, ma, mb, k in flagged:
        bruns = b[k]["runs"]
        print(f"  {ma:7.2f} -> {mb:7.2f}  {k}  close runs={bruns} at={b[k].get('at')}")
    if not flagged:
        print("  none")


if __name__ == "__main__":
    main()
