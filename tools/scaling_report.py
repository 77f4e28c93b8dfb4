#!/usr/bin/env python3
"""Scaling report: per-query median ratio between two Bench JSON
artifacts (e.g. sf0.1 vs sf1). Flags superlinear scalers — at 10x
data a ratio near 10 is linear, well above it needs a mechanism
note in PERF.md.

Usage: scaling_report.py <bench_small.json> <bench_big.json> [factor]
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q, t_small in sorted(small["queries"].items()):
        t_big = big["queries"].get(q)
        if t_big is None or t_small <= 0 or t_big <= 0:
            continue
        rows.append((t_big / t_small, q, t_small, t_big))
    rows.sort(reverse=True)
    print(f"{'query':<28} {'sf_small':>8} {'sf_big':>8} {'ratio':>6}  vs {factor:g}x data")
    for ratio, q, a, b in rows:
        flag = " <-- superlinear" if ratio > factor * 1.3 else (
            " (sublinear)" if ratio < factor * 0.7 else "")
        print(f"{q:<28} {a:>8.2f} {b:>8.2f} {ratio:>6.1f}{flag}")
    tot_s = small.get("value")
    tot_b = big.get("value")
    if tot_s and tot_b:
        print(f"\nheadline totals: {tot_s:.1f} -> {tot_b:.1f} s "
              f"({tot_b / tot_s:.1f}x at {factor:g}x data)")


if __name__ == "__main__":
    main()
