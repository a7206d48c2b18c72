#!/usr/bin/env python3
"""Nonlinearity detector: per-query sf1/sf0.1 bench ratio.

Usage: python3 tools/sf1_ratio.py <sf01_bench.json> <sf1_bench.json>

With 10x the data on the same cores, a scale-linear query lands near
ratio 10 (often below: fixed overheads amortize). Flags queries whose
ratio exceeds 3x the board median — the candidates for a quadratic
candidate-set, an unbounded window, or a driver-side pull that grew.
Dev tooling only.
"""
import json
import statistics
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    shared = [k for k in b if k in a and a[k] > 0.02 and b[k] > 0]
    ratios = {k: b[k] / a[k] for k in shared}
    med = statistics.median(ratios.values())
    print(f"{len(shared)} shared queries; median ratio {med:.2f}; "
          f"sf1 total {sum(v for v in b.values() if v > 0):.1f}s")
    flagged = sorted(((r, k) for k, r in ratios.items() if r > 3 * med),
                     reverse=True)
    print(f"\n== flagged (> 3x median = {3*med:.1f}) ==")
    for r, k in flagged:
        print(f"{r:7.1f}x  {k}  {a[k]:.2f}s -> {b[k]:.1f}s")
    print("\n== top 15 by sf1 absolute time ==")
    for k in sorted(b, key=lambda k: -b[k])[:15]:
        rs = f"{ratios[k]:.1f}x" if k in ratios else "n/a"
        print(f"{b[k]:7.1f}s  {rs:>7}  {k}")
    failed = [k for k, v in b.items() if v < 0]
    if failed:
        print(f"\nFAILED at sf1: {failed}")


if __name__ == "__main__":
    main()
