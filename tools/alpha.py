#!/usr/bin/env python3
"""Scale-exponent table for a large-SF bench record vs the sf0.1 canonical.

alpha = log10(T_big / T_small) / log10(SF_ratio); 1.0 = linear in data
size, 0 = flat. The BASELINE.md sweeps use SF_ratio = 100 (sf0.1 ->
sf10), so alpha = log10(ratio)/2.

Usage: tools/alpha.py bench_sf10.json bench_canonical_rN.json [ratio=100]

Prints one row per common query sorted by alpha descending, plus
summary counts (superlinear alpha>1, worst alpha, flat alpha<0.15).
Queries present in only one record are listed so a partial record
can't silently read as complete coverage.
"""
import json
import math
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    big = json.load(open(sys.argv[1])).get("queries", {})
    small = json.load(open(sys.argv[2])).get("queries", {})
    sf_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    denom = math.log10(sf_ratio)
    big = {q: v for q, v in big.items() if isinstance(v, (int, float)) and v > 0}
    small = {q: v for q, v in small.items() if isinstance(v, (int, float)) and v > 0}
    common = sorted(set(big) & set(small))
    rows = [(q, small[q], big[q], math.log10(big[q] / small[q]) / denom) for q in common]
    rows.sort(key=lambda r: -r[3])
    for q, s, b, a in rows:
        print(f"{q:40s} {s:8.2f} {b:9.2f}  alpha {a:5.2f}")
    sup = [q for q, _, _, a in rows if a > 1.0]
    flat = [q for q, _, _, a in rows if a < 0.15]
    print(f"\n{len(rows)} common queries; worst alpha "
          f"{rows[0][3]:.2f} ({rows[0][0]})" if rows else "no common queries")
    print(f"superlinear (alpha>1): {len(sup)}" + (f" -> {sup}" if sup else ""))
    print(f"flat (alpha<0.15): {len(flat)}")
    only_big = sorted(set(big) - set(small))
    only_small = sorted(set(small) - set(big))
    if only_big:
        print(f"only in {sys.argv[1]}: {only_big}")
    if only_small:
        print(f"only in {sys.argv[2]}: {only_small}")


if __name__ == "__main__":
    main()
