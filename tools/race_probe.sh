#!/bin/bash
# Two-real-JVM IndexStore publish-race check: launches two
# graft.IndexRaceProbe processes against the SAME cold store and
# asserts both resolve a complete, content-identical index (winner
# publishes; loser degrades to reuse — neither crashes, no torn part).
# Usage: tools/race_probe.sh [dataset_dir]
set -e
cd "$(dirname "$0")/.."
D="${1:-/root/testdata/sf0.001}"
STORE=$(mktemp -d /tmp/graft_race_store.XXXX)
trap 'rm -rf "$STORE"' EXIT
export SPARK_GRAFT_INDEX_DIR="$STORE"
tools/run_main.sh graft.IndexRaceProbe "$D" > /tmp/race_a.out 2>/tmp/race_a.err &
PA=$!
tools/run_main.sh graft.IndexRaceProbe "$D" > /tmp/race_b.out 2>/tmp/race_b.err &
PB=$!
FAIL=0
wait $PA || { echo "probe A exited nonzero"; FAIL=1; }
wait $PB || { echo "probe B exited nonzero"; FAIL=1; }
A=$(grep '"probe":"index_race"' /tmp/race_a.out | tail -1)
B=$(grep '"probe":"index_race"' /tmp/race_b.out | tail -1)
echo "A: $A"
echo "B: $B"
grep -h '\[index\]' /tmp/race_a.err /tmp/race_b.err || true
if [ -z "$A" ] || [ -z "$B" ]; then echo "RACE_PROBE: FAIL (missing output)"; exit 1; fi
if [ "$FAIL" != 0 ]; then echo "RACE_PROBE: FAIL (crash)"; exit 1; fi
if [ "$A" == "$B" ]; then
  echo "RACE_PROBE: PASS (both JVMs resolved identical complete index)"
else
  echo "RACE_PROBE: FAIL (divergent resolution)"; exit 1
fi
