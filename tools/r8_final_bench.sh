#!/usr/bin/env bash
# Round-8 final recording: one quiet-gated probe series, then the sf0.1
# Bench only — the build ladder is unchanged by this session's work
# (percolator / _explain / pipeline aggs / multi-index merges are all
# query-layer; shuffle B/turn stays bit-identical), so it is not re-run.
set -uo pipefail
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  out=$(SPARK_GRAFT_BENCH_CONVS=120000 sbt -batch "runMain graft.ScalingBench 1" 2>/dev/null \
    | grep -o '{"metric":"scaling_point".*}' | tail -1)
  cpu=$(echo "$out" | python3 -c "import json,sys; print(round(json.load(sys.stdin)['cpu_us_per_turn'],2))")
  tps=$(echo "$out" | python3 -c "import json,sys; print(round(json.load(sys.stdin)['build_turns_per_sec'],1))")
  echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"probe\":\"ScalingBench 1 (final bench gate)\",\"cpu_us_per_turn\":$cpu,\"build_turns_per_sec\":$tps,\"attempt\":$i,\"gate\":\"<158\"}" >> BENCH_PROBES_r08.jsonl
  if python3 -c "import sys; sys.exit(0 if $cpu < 158 else 1)"; then
    echo "probe $i quiet ($cpu us) - benching" >&2
    break
  fi
  if [ "$i" = "3" ]; then
    echo "no quiet window after 3 probes - benching anyway" >&2
  else
    sleep 300
  fi
done
echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"event\":\"final_bench_start\"}" >> BENCH_PROBES_r08.jsonl
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/graft-bench-r8c.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r8c.out 2>&1
echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"event\":\"final_bench_done\"}" >> BENCH_PROBES_r08.jsonl
