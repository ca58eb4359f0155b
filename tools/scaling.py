#!/usr/bin/env python3
"""Per-query scaling exponents between two Bench records.

Usage: tools/scaling.py <bench_small.json> <bench_big.json> [factor=10]

Prints alpha = log(T_big / T_small) / log(factor) per query, sorted
descending — alpha ~ 1 is linear scaling, alpha < 1 sublinear (fixed
overheads still dominate), alpha > 1 superlinear (the 100x-direction
red flag). Queries missing from either record are listed separately.
"""
import json, math, sys


def best(rec):
    out = {}
    for q, v in rec.get("queries", {}).items():
        if isinstance(v, list):
            v = min(x for x in v if isinstance(x, (int, float)))
        if isinstance(v, (int, float)):
            out[q] = float(v)
    return out


def main():
    small = best(json.load(open(sys.argv[1])))
    big = best(json.load(open(sys.argv[2])))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q in sorted(set(small) & set(big)):
        if small[q] > 0 and big[q] > 0:
            rows.append((math.log(big[q] / small[q]) / math.log(factor), small[q], big[q], q))
    rows.sort(reverse=True)
    print(f"{'alpha':>6} {'t_small':>8} {'t_big':>8}  query")
    for a, ts, tb, q in rows:
        flag = "  <-- superlinear" if a > 1.1 else ""
        print(f"{a:6.2f} {ts:8.2f} {tb:8.2f}  {q}{flag}")
    only_small = sorted(set(small) - set(big))
    only_big = sorted(set(big) - set(small))
    if only_small:
        print("only in small:", " ".join(only_small))
    if only_big:
        print("only in big:", " ".join(only_big))
    lin = [r for r in rows if r[0] > 1.1]
    print(f"\n{len(rows)} compared; {len(lin)} superlinear (alpha > 1.1)")


if __name__ == "__main__":
    main()
