#!/bin/bash
# Round-3 follow-up battery — runs AFTER battery_r3.sh. Decomposition
# probes for the surprises the r2c battery measured (k-core tail grids
# won only 1.18x; SSSP W=1024 lost end-to-end). Appends to
# benchmarks/results_r3b.jsonl. One process per measurement.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_r3b.jsonl
run() {
  echo "== $*" >&2
  timeout 1200 "$@" | tee -a "$OUT"
}

# 1. k-core per-wave floor decomposition (ms/round by variant):
#    nop isolates the while_loop body; xla vs full isolates the
#    decrement kernel; tail-grid env sweeps the grid tiers.
run python benchmarks/probe_kcore_floor.py --variant nop  --scale 16 --degsort
run python benchmarks/probe_kcore_floor.py --variant xla  --scale 16 --degsort
run python benchmarks/probe_kcore_floor.py --variant full --scale 16 --degsort
GUNROCK_TAIL_GRIDS="" run python benchmarks/probe_kcore_floor.py --variant full --scale 16 --degsort
GUNROCK_TAIL_GRIDS="8,64,512" run python benchmarks/probe_kcore_floor.py --variant full --scale 18 --degsort
run python benchmarks/probe_kcore_floor.py --variant nop  --scale 18 --degsort
run python benchmarks/probe_kcore_floor.py --variant full --scale 18 --degsort
