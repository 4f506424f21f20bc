#!/usr/bin/env bash
# Scaling-efficiency protocol (BASELINE.md): identical build+query job at
# local[8] (N) and local[32] (4N), each in a fresh JVM, nothing else
# running. Usage: tools/scaling.sh [nConvs]
set -euo pipefail
cd "$(dirname "$0")/.."
NCONVS="${1:-120000}"
REPS="${2:-3}"
RESULTS=()
for rep in $(seq 1 "$REPS"); do
  for cores in 8 32; do
    out=$(SPARK_GRAFT_BENCH_CONVS=$NCONVS sbt -batch "runMain graft.ScalingBench $cores" 2>/dev/null \
      | grep -o '{"metric":"scaling_point".*}' | tail -1)
    echo "rep$rep cores=$cores $out" >&2
    RESULTS+=("$out")
  done
done
python3 - "${RESULTS[@]}" <<'EOF'
import json, statistics, sys
pts = [json.loads(x) for x in sys.argv[1:]]
by = {8: [], 32: []}
q = {8: [], 32: []}
for p in pts:
    by[p["cores"]].append(p["build_turns_per_sec"])
    q[p["cores"]].append(p["p50_query_sec"])
m8, m32 = statistics.median(by[8]), statistics.median(by[32])
print(json.dumps({
    "metric": "scaling_efficiency", "value": m32 / (4 * m8), "unit": "ratio",
    "build_turns_per_sec_local8_median": m8,
    "build_turns_per_sec_local32_median": m32,
    "build_turns_per_sec_local8_all": by[8],
    "build_turns_per_sec_local32_all": by[32],
    "p50_query_sec_local8_median": statistics.median(q[8]),
    "p50_query_sec_local32_median": statistics.median(q[32]),
    "nConvs": pts[0]["nConvs"]}))
EOF
