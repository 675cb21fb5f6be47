#!/usr/bin/env bash
# Standing ~sf1 differential gate (run per round; VERDICT r7 item 2):
# tile the largest read-only fixture x10 with ScaleGen, dump the whole
# registry with Verify, run every oracle in DuckDB one decade above the
# driver's gate SF, and emit SCALECHECK_r<N>.json.
#
# Usage: tools/scalecheck.sh <round>     e.g. tools/scalecheck.sh 8
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scalecheck.sh <round>}"
SF1=/tmp/sf1
OUT=/tmp/sf1_out
# the ~sf1 registry needs more than build.sbt's 8g default heap
# (q_skew_aqe's sorter OOMs 32 concurrent tasks at 6 M lineitem)
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"

if [ ! -d "$SF1/lineitem.parquet" ]; then
  echo "== ScaleGen x10: /root/testdata/sf0.1 -> $SF1"
  sbt -batch "runMain graft.tools.ScaleGen /root/testdata/sf0.1 $SF1 10"
fi
echo "== Verify full registry at ~sf1"
rm -rf "$OUT"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF1 $OUT"
echo "== DuckDB differential"
python3 tools/selfcheck.py "$SF1" "$OUT" --json "SCALECHECK_r${ROUND}.json"
