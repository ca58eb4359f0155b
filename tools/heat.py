#!/usr/bin/env python3
"""Session-heat reading for a bench record (VERDICT r15 task 6).

Every round used to re-derive "is this record hot?" by hand from
control queries. This mechanizes it: given a candidate canonical
record, print its per-query geomean ratio (and the 5 worst ratios)
vs (a) the BASELINE.md canonical table (last-occurrence wins — the
re-baselined-in-place convention) and (b) the previous round's
committed canonical record, if one is given or discoverable.

Usage: tools/heat.py bench_out.json [prev_canonical.json]

Interpretation (CLAUDE.md / graft-bench-noise memory): whole-session
drift of +-10-15% is real host noise; geomean >~1.10 vs the previous
canonical means the session ran hot — prefer re-running and taking
the better of two complete warm-store sessions before committing.
"""
import glob
import json
import math
import os
import re
import sys


def baseline_table(path):
    """Last-occurrence-wins per-query seconds from BASELINE.md."""
    rows = {}
    pat = re.compile(r"^\|\s*(q\S+)\s*\|\s*([0-9.]+)\s*\|")
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                rows[m.group(1)] = float(m.group(2))
    return rows


def ratios(new, old, label):
    common = sorted(set(new) & set(old))
    rs = [(q, new[q] / old[q]) for q in common if old[q] > 0 and new[q] > 0]
    if not rs:
        print(f"HEAT vs {label}: no common queries")
        return
    g = math.exp(sum(math.log(r) for _, r in rs) / len(rs))
    worst = sorted(rs, key=lambda t: -t[1])[:5]
    over2 = [q for q, r in rs if r > 2.0]
    print(f"HEAT vs {label}: geomean {g:.3f} over {len(rs)} common queries"
          + (f"; {len(over2)} over 2x: {over2[:8]}" if over2 else ""))
    print("  worst: " + ", ".join(f"{q} {r:.2f}x ({old[q]:.2f}->{new[q]:.2f}s)"
                                  for q, r in worst))
    if g > 1.10:
        print(f"  NOTE: session reads HOT (geomean {g:.3f} > 1.10) — consider a "
              "second complete session and keep the better record")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(sys.argv[1]))) or "."
    repo = os.path.dirname(os.path.abspath(__file__)) + "/.."
    rec = json.load(open(sys.argv[1]))
    new = {q: v for q, v in rec.get("queries", {}).items() if isinstance(v, (int, float))}
    base = baseline_table(os.path.join(repo, "BASELINE.md"))
    ratios(new, base, "BASELINE.md canonical table")
    prev = None
    if len(sys.argv) > 2:
        prev = sys.argv[2]
    else:
        canons = sorted(glob.glob(os.path.join(repo, "bench_canonical_r*.json")))
        canons = [c for c in canons if os.path.abspath(c) != os.path.abspath(sys.argv[1])]
        if canons:
            prev = canons[-1]
    if prev:
        pq = json.load(open(prev)).get("queries", {})
        ratios(new, {q: v for q, v in pq.items() if isinstance(v, (int, float))},
               os.path.basename(prev))


if __name__ == "__main__":
    main()
