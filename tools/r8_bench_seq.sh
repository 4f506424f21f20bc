#!/usr/bin/env bash
# Round-8 quiet-window recording: probe-first rule (single ScalingBench 1
# until CPU/turn < 158 us or 6 attempts), then the recorded ladder
# protocol (240k convs, 5 reps, local[1] vs local[4]) and the sf0.1
# Bench (per-entry median-of-3 on every q_* entry incl. the round-8
# operators + the multi-index fan-out line), serially, nothing else
# running.
set -uo pipefail
cd "$(dirname "$0")/.."
for i in 1 2 3 4 5 6; do
  out=$(SPARK_GRAFT_BENCH_CONVS=120000 sbt -batch "runMain graft.ScalingBench 1" 2>/dev/null \
    | grep -o '{"metric":"scaling_point".*}' | tail -1)
  cpu=$(echo "$out" | python3 -c "import json,sys; print(round(json.load(sys.stdin)['cpu_us_per_turn'],2))")
  tps=$(echo "$out" | python3 -c "import json,sys; print(round(json.load(sys.stdin)['build_turns_per_sec'],1))")
  echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"probe\":\"ScalingBench 1\",\"cpu_us_per_turn\":$cpu,\"build_turns_per_sec\":$tps,\"attempt\":$i,\"gate\":\"<158\"}" >> BENCH_PROBES_r08.jsonl
  if python3 -c "import sys; sys.exit(0 if $cpu < 158 else 1)"; then
    echo "probe $i quiet ($cpu us) - laddering" >&2
    break
  fi
  if [ "$i" = "6" ]; then
    echo "no quiet window after 6 probes - laddering anyway (probe series is the evidence)" >&2
  else
    sleep 420
  fi
done
echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"event\":\"ladder_start\"}" >> BENCH_PROBES_r08.jsonl
tools/scaling.sh 240000 5 1 4 > /tmp/scaling_r8.json 2>/tmp/scaling_r8.reps
echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"event\":\"ladder_done\"}" >> BENCH_PROBES_r08.jsonl
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/graft-bench-r8.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r8.out 2>&1
echo "{\"ts\":\"$(date -u +%FT%TZ)\",\"event\":\"bench_done\"}" >> BENCH_PROBES_r08.jsonl
