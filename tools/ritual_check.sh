#!/bin/bash
# End-of-round ritual guard: fails unless the given canonical bench
# record (a) contains EXACTLY the benched-query set of the compiled
# HEAD (catches a bench_canonical_r{N}.json produced before the last
# feature commit — the round-13 record-hygiene defect), and (b) gives
# every query >= 2 measured runs (a one-run row means the suite tail
# was budget-starved — the round-14 fresh-container cold-index-store
# episode — and the recorded value is a first-run number 2-4x
# canonical, not a measurement).
# Usage: tools/ritual_check.sh bench_canonical_r14.json
set -e
cd "$(dirname "$0")/.."
CANON="${1:?usage: tools/ritual_check.sh bench_canonical_rN.json}"
tools/run_main.sh graft.BenchList > /tmp/ritual_expected.txt
python3 - "$CANON" <<'EOF'
import json, sys
canon = json.load(open(sys.argv[1]))
got = set(canon.get("queries", {})) | set(canon.get("dnf", []))
exp = set(open("/tmp/ritual_expected.txt").read().split())
missing, extra = sorted(exp - got), sorted(got - exp)
fail = False
if missing or extra:
    if missing: print(f"RITUAL_CHECK: FAIL — canonical record missing {len(missing)} benched queries of HEAD: {missing[:10]}")
    if extra:   print(f"RITUAL_CHECK: FAIL — canonical record has {len(extra)} queries HEAD no longer benches: {extra[:10]}")
    fail = True
# iterate the EXPECTED query set, not the record's runs keys: a query
# listed in 'queries' but missing its 'runs' entry (or a record from a
# binary predating the runs field) must FAIL the starvation check, not
# silently pass it
runs = canon.get("runs", {})
dnf = set(canon.get("dnf", []))
single = sorted(q for q in exp if q not in dnf and len(runs.get(q, [])) < 2)
if single:
    print(f"RITUAL_CHECK: FAIL — {len(single)} queries have fewer than TWO recorded runs (budget-starved tail or pre-runs-field record; re-run with a warm index store / larger SPARK_GRAFT_BENCH_BUDGET): {single[:12]}")
    fail = True
if canon.get("dnf"):
    print(f"RITUAL_CHECK: note — record carries {len(canon['dnf'])} DNF entries: {sorted(canon['dnf'])[:10]}")
if fail:
    sys.exit(1)
print(f"RITUAL_CHECK: PASS — canonical record matches HEAD's {len(exp)} benched queries, all with >=2 runs")
EOF
# session-heat reading (informational, not gating): geomean vs the
# BASELINE.md canonical table and vs the previous round's canonical,
# plus the 5 worst ratios — the keeper-session decision input
python3 tools/heat.py "$CANON"
