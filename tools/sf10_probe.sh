#!/usr/bin/env bash
# Isolated sf10 probe driver (verdict r11 task #2): one fresh JVM per
# query — the r11 batch run died of CUMULATIVE session disk/memory
# pressure (211 GB spill against 65 GB free), not per-query failures, so
# isolation is the only honest way to measure the next decade. Appends
# each query's BENCH_DETAIL row to $OUT as JSONL.
#
#   tools/sf10_probe.sh out.jsonl q1 q2 ...
set -uo pipefail
OUT=$1; shift
cd "$(dirname "$0")/.."
for q in "$@"; do
  echo "[sf10-probe] $q"
  # 17g heap — the r11 probe's fixed heap, so byte/spill ratios compare
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-17g} \
    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$q" SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch "runMain graft.Bench" > /tmp/sf10_probe_$q.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] && [ -f BENCH_DETAIL.json ]; then
    python3 - "$q" <<'EOF' >> "$OUT"
import json, sys
q = sys.argv[1]
d = json.load(open('BENCH_DETAIL.json'))
row = d['queries_detail'][q]
print(json.dumps({'query': q, **row}))
EOF
  else
    echo "{\"query\": \"$q\", \"errors\": 1, \"rc\": $rc}" >> "$OUT"
    tail -5 /tmp/sf10_probe_$q.log
  fi
  # NO /tmp/blockmgr-* cleanup here: a normally-exiting JVM removes its
  # own dirs, and a blanket rm would delete the LIVE shuffle dirs of any
  # concurrent session (measured: it failed a parallel PlanAudit run
  # with FileNotFoundException on its temp_shuffle files)
done
echo "[sf10-probe] done -> $OUT"
