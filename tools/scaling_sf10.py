#!/usr/bin/env python3
"""Full-suite sf10 sweep analysis: per-query and per-family alpha vs the
sf0.1 canonical record.  alpha = log10(T_sf10 / T_sf0.1) / log10(100/...)
-- convention from BASELINE.md sweeps: alpha = log10(ratio)/2 for a
100x data step (sf0.1 -> sf10), so alpha 1.0 = linear, <1 sublinear.

Usage: tools/scaling_sf10.py /tmp/bench_sf10_r14.json bench_canonical_r14.json
"""
import json, math, sys
from collections import defaultdict

sf10 = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "bench_canonical_r13.json"))

FAMILIES = [
    ("graph", ("q84", "q149", "q150", "q151", "q157", "q159", "q167", "q168", "q169", "q172")),
    ("training", ("q56", "q57", "q58", "q67", "q68", "q127", "q140", "q148", "q163", "q164", "q165", "q166")),
    ("streaming", ("q59", "q60", "q61", "q62", "q63", "q70", "q79", "q80", "q81", "q82", "q83")),
    ("dedup", ("q45", "q46", "q47", "q48", "q49", "q50", "q103", "q130", "q134", "q138", "q141", "q142", "q143", "q144", "q152", "q187", "q189")),
    ("ann", ("q51", "q52", "q53", "q64", "q76", "q92", "q139", "q175", "q184")),
    ("text", ("q40", "q41", "q42", "q43", "q44", "q91", "q93", "q94", "q153", "q155", "q170", "q179", "q186")),
    ("mixture", ("q117", "q178", "q180", "q181", "q182", "q183")),
]
def family(q):
    pre = q.split("_")[0]
    for name, pres in FAMILIES:
        if pre in pres:
            return name
    return "relational/other"

rows = []
for q, t10 in sorted(sf10.get("queries", {}).items()):
    t01 = base.get("queries", {}).get(q)
    if not t01 or t01 <= 0:
        rows.append((q, t01, t10, None))
        continue
    alpha = math.log10(t10 / t01) / 2.0
    rows.append((q, t01, t10, alpha))

print(f"{'query':42s} {'sf0.1':>8s} {'sf10':>9s} {'ratio':>7s} {'alpha':>6s}")
fam_alphas = defaultdict(list)
flagged = []
for q, t01, t10, a in rows:
    if a is None:
        print(f"{q:42s} {'-':>8s} {t10:9.2f}       -      -")
        continue
    mark = "  <-- SUPERLINEAR" if a > 1.1 else ""
    if a > 1.1:
        flagged.append(q)
    print(f"{q:42s} {t01:8.2f} {t10:9.2f} {t10/t01:6.1f}x {a:6.2f}{mark}")
    fam_alphas[family(q)].append(a)

print("\nPer-family alpha (median [min..max], n):")
for fam in sorted(fam_alphas):
    v = sorted(fam_alphas[fam])
    med = v[len(v) // 2]
    print(f"  {fam:18s} {med:5.2f}  [{v[0]:5.2f} .. {v[-1]:5.2f}]  n={len(v)}")

dnf = sf10.get("dnf", [])
err = sf10.get("err", {})
print(f"\nDNF: {dnf}\nerr: {list(err)}\nflagged alpha>1.1: {flagged}")
print(f"n benched at sf10: {len(sf10.get('queries', {}))}, total {sum(sf10.get('queries', {}).values()):.0f}s")
