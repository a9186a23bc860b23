"""Summarize ab_r14.sh output: per-query median-of-run-medians per side.

Usage: python tools/ab_summary.py <out_prefix>
"""

import glob
import json
import sys


def med(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main():
    prefix = sys.argv[1]
    sides = {"A": {}, "B": {}}
    for side in sides:
        for f in sorted(glob.glob(f"{prefix}_{side}*.json")):
            data = json.load(open(f))
            for q, v in data["results"].items():
                sides[side].setdefault(q, []).append(v["median"])
    queries = sorted(set(sides["A"]) | set(sides["B"]))
    print(f"{'query':40s} {'A(before)':>10s} {'B(after)':>10s} {'B/A':>6s}")
    ta = tb = 0.0
    for q in queries:
        a = med(sides["A"][q]) if sides["A"].get(q) else float("nan")
        b = med(sides["B"][q]) if sides["B"].get(q) else float("nan")
        ta += a
        tb += b
        print(f"{q:40s} {a:10.3f} {b:10.3f} {b / a:6.2f}")
        print(f"    A runs: {sides['A'].get(q)}  B runs: {sides['B'].get(q)}")
    print(f"{'TOTAL':40s} {ta:10.3f} {tb:10.3f} {tb / ta:6.2f}")


if __name__ == "__main__":
    main()
