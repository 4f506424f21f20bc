#!/usr/bin/env bash
# Scaling-efficiency protocol (BASELINE.md): identical build+query job at
# local[8] (N) and local[32] (4N), each in a fresh JVM, nothing else
# running. Usage: tools/scaling.sh [nConvs]
set -euo pipefail
cd "$(dirname "$0")/.."
NCONVS="${1:-120000}"
OUT8=$(SPARK_GRAFT_BENCH_CONVS=$NCONVS sbt -batch "runMain graft.ScalingBench 8" 2>/dev/null | grep -o '{"metric":"scaling_point".*}' | tail -1)
OUT32=$(SPARK_GRAFT_BENCH_CONVS=$NCONVS sbt -batch "runMain graft.ScalingBench 32" 2>/dev/null | grep -o '{"metric":"scaling_point".*}' | tail -1)
python3 - "$OUT8" "$OUT32" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = b["build_turns_per_sec"] / (4 * a["build_turns_per_sec"])
print(json.dumps({
    "metric": "scaling_efficiency", "value": eff, "unit": "ratio",
    "build_turns_per_sec_local8": a["build_turns_per_sec"],
    "build_turns_per_sec_local32": b["build_turns_per_sec"],
    "p50_query_sec_local8": a["p50_query_sec"],
    "p50_query_sec_local32": b["p50_query_sec"],
    "nConvs": a["nConvs"]}))
EOF
