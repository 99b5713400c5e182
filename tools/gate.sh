#!/bin/bash
# Tri-SF oracle gate: runs graft.Verify then the DuckDB comparison at
# each scale factor. Usage: tools/gate.sh [outdir-prefix]
# Prints one summary line per SF; all three must read N/N.
set -e
cd "$(dirname "$0")/.."
prefix=${1:-/tmp/gate}
for sf in sf0.001 sf0.01 sf0.1; do
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
    sbt -batch "runMain graft.Verify /root/testdata/$sf ${prefix}_$sf" \
    > /dev/null 2>&1
  echo "== $sf =="
  python3 tools/check.py "/root/testdata/$sf" "${prefix}_$sf" | tail -1
done
