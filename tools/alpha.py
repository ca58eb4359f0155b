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
    big_rec = json.load(open(sys.argv[1]))
    small_rec = json.load(open(sys.argv[2]))
    big = big_rec.get("queries", {})
    small = small_rec.get("queries", {})
    # a DNF'd query is recorded AT the cap value — its "timing" is a
    # LOWER BOUND, not a measurement; mark it so the table can't read
    # the cap as an equality (and same for err'd queries, if timed)
    capped = set(big_rec.get("dnf", [])) | set(big_rec.get("err", [])) | \
        set(small_rec.get("dnf", [])) | set(small_rec.get("err", []))
    sf_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    denom = math.log10(sf_ratio)
    big = {q: v for q, v in big.items() if isinstance(v, (int, float)) and v > 0}
    small = {q: v for q, v in small.items() if isinstance(v, (int, float)) and v > 0}
    common = sorted(set(big) & set(small))
    rows = [(q, small[q], big[q], math.log10(big[q] / small[q]) / denom) for q in common]
    rows.sort(key=lambda r: -r[3])
    for q, s, b, a in rows:
        mark = "  alpha"
        if q in capped:
            mark = " alpha>=" if q in big_rec.get("dnf", []) or q in big_rec.get("err", []) else "  alpha"
        suffix = " (DNF/err: cap value, lower bound)" if q in capped else ""
        print(f"{q:40s} {s:8.2f} {b:9.2f} {mark} {a:5.2f}{suffix}")
    if capped & set(common):
        print(f"\nNOTE: {sorted(capped & set(common))} hit the run cap or errored — "
              "their rows are lower bounds, not timings.")
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
