#!/usr/bin/env bash
# Scaling-efficiency protocol (BASELINE.md): identical build+query job at
# local[N] and local[4N], each in a fresh JVM, nothing else running.
# Usage: tools/scaling.sh [nConvs] [reps] [loCores] [hiCores]
set -euo pipefail
cd "$(dirname "$0")/.."
NCONVS="${1:-120000}"
REPS="${2:-3}"
LO="${3:-1}"
HI="${4:-4}"
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
def med(cores, field):
    return statistics.median(p[field] for p in pts if p["cores"] == cores)
def allv(cores, field):
    return [p[field] for p in pts if p["cores"] == cores]
mlo, mhi = med(lo, "build_turns_per_sec"), med(hi, "build_turns_per_sec")
print(json.dumps({
    "metric": "scaling_efficiency", "value": mhi / ((hi / lo) * mlo), "unit": "ratio",
    "cores": [lo, hi],
    f"build_turns_per_sec_local{lo}_median": mlo,
    f"build_turns_per_sec_local{hi}_median": mhi,
    f"build_turns_per_sec_local{lo}_all": allv(lo, "build_turns_per_sec"),
    f"build_turns_per_sec_local{hi}_all": allv(hi, "build_turns_per_sec"),
    # engine-side evidence: CPU-seconds per turn should stay flat if the
    # plan scales (growth = hardware contention, not plan serialization)
    f"cpu_us_per_turn_local{lo}_median": med(lo, "cpu_us_per_turn"),
    f"cpu_us_per_turn_local{hi}_median": med(hi, "cpu_us_per_turn"),
    f"shuffle_bytes_per_turn_local{lo}_median": med(lo, "shuffle_bytes_per_turn"),
    f"shuffle_bytes_per_turn_local{hi}_median": med(hi, "shuffle_bytes_per_turn"),
    f"p50_query_sec_local{lo}_median": med(lo, "p50_query_sec"),
    f"p50_query_sec_local{hi}_median": med(hi, "p50_query_sec"),
    "nConvs": pts[0]["nConvs"]}))
EOF
