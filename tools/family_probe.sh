#!/usr/bin/env bash
# Isolated per-query probe over an arbitrary SF dir (generalizes
# tools/sf10_probe.sh, which is pinned to testdata_sf10): one fresh JVM
# per query so cumulative session disk/memory pressure can't contaminate
# the measurement. Appends each query's BENCH_DETAIL row to $OUT as
# JSONL with the sf dir recorded.
#
#   tools/family_probe.sh sf_dir out.jsonl q1 q2 ...
set -uo pipefail
SF=$1; OUT=$2; shift 2
cd "$(dirname "$0")/.."
for q in "$@"; do
  echo "[family-probe] $SF $q"
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-17g} \
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$q" SPARK_GRAFT_BENCH_REPS=${PROBE_REPS:-1} \
    sbt -batch "runMain graft.Bench" > /tmp/family_probe_$q.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] && [ -f BENCH_DETAIL.json ]; then
    python3 - "$q" "$SF" <<'EOF' >> "$OUT"
import json, sys
q, sf = sys.argv[1], sys.argv[2]
d = json.load(open('BENCH_DETAIL.json'))
row = d['queries_detail'][q]
print(json.dumps({'query': q, 'sf_dir': sf, **row}))
EOF
  else
    echo "{\"query\": \"$q\", \"sf_dir\": \"$SF\", \"errors\": 1, \"rc\": $rc}" >> "$OUT"
    tail -5 /tmp/family_probe_$q.log
  fi
done
echo "[family-probe] done -> $OUT"
