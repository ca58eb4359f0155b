#!/bin/bash
# Round-13 robustness matrix on the final binary. Each config gets a
# FRESH index-store dir so index BUILDS (not just serving) run under
# the config. Writes one summary line per config to /tmp/r13_matrix.log.
set -u
cd /root/repo
LOG=/tmp/r13_matrix.log
: > $LOG
run() {
  local name=$1 cpus=$2 opts=$3
  local ix=/tmp/ixm_$name out=/tmp/outm_$name
  rm -rf $ix $out
  echo "=== $name (cpus=$cpus opts='$opts') ===" >> $LOG
  GRAFT_JAVA_OPTS="$opts" SPARK_GRAFT_INDEX_DIR=$ix SPARK_GRAFT_CPUS=$cpus \
    tools/run_main.sh graft.Verify /root/testdata/sf0.01 $out > /tmp/vm_$name.log 2>&1
  python3 tools/parity.py /root/testdata/sf0.01 $out 2>&1 | tail -1 >> $LOG
}
run default 8 ""
run codegen 8 "-Dspark.sql.codegen.wholeStage=false -Dspark.sql.codegen.factoryMode=NO_CODEGEN"
run aqe 8 "-Dspark.sql.adaptive.enabled=false"
run cpus5 5 ""
run spill 8 "-Dspark.memory.fraction=0.1"
echo MATRIXDONE >> $LOG
