#!/usr/bin/env bash
# Scaling-efficiency protocol (BASELINE.md): identical build+query job at
# local[8] (N) and local[32] (4N), each in a fresh JVM, nothing else
# running. Usage: tools/scaling.sh [nConvs]
set -euo pipefail
cd "$(dirname "$0")/.."
NCONVS="${1:-120000}"
REPS="${2:-3}"
LO="${3:-8}"
HI="${4:-32}"
RESULTS=()
for rep in $(seq 1 "$REPS"); do
  for cores in "$LO" "$HI"; do
    out=$(SPARK_GRAFT_BENCH_CONVS=$NCONVS sbt -batch "runMain graft.ScalingBench $cores" 2>/dev/null \
      | grep -o '{"metric":"scaling_point".*}' | tail -1)
    echo "rep$rep cores=$cores $out" >&2
    RESULTS+=("$out")
  done
done
python3 - "$LO" "$HI" "${RESULTS[@]}" <<'EOF'
import json, statistics, sys
lo, hi = int(sys.argv[1]), int(sys.argv[2])
pts = [json.loads(x) for x in sys.argv[3:]]
by = {lo: [], hi: []}
q = {lo: [], hi: []}
for p in pts:
    by[p["cores"]].append(p["build_turns_per_sec"])
    q[p["cores"]].append(p["p50_query_sec"])
mlo, mhi = statistics.median(by[lo]), statistics.median(by[hi])
print(json.dumps({
    "metric": "scaling_efficiency", "value": mhi / ((hi / lo) * mlo), "unit": "ratio",
    "cores": [lo, hi],
    f"build_turns_per_sec_local{lo}_median": mlo,
    f"build_turns_per_sec_local{hi}_median": mhi,
    f"build_turns_per_sec_local{lo}_all": by[lo],
    f"build_turns_per_sec_local{hi}_all": by[hi],
    f"p50_query_sec_local{lo}_median": statistics.median(q[lo]),
    f"p50_query_sec_local{hi}_median": statistics.median(q[hi]),
    "nConvs": pts[0]["nConvs"]}))
EOF
