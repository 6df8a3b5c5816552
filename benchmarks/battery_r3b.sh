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

# 2. Tail grids per-algorithm A/B: bench.py measured BFS 75.18 MTEPS
#    without tail grids vs 72.31 with (~4% tax on the always-dense
#    traversal); k-core keeps +15% at s18. Which way do SSSP (mixed
#    frontier sizes) and greedy coloring (collapsed stragglers) go?
GUNROCK_TAIL_GRIDS="" run python benchmarks/ab_sssp_do.py --reorder degree --edge_budget 20520 --window 2048 --chunk 256
GUNROCK_TAIL_GRIDS="" run python benchmarks/ab_color_strategy.py --strategy greedy --degsort --scale 18
run python benchmarks/ab_color_strategy.py --strategy greedy --degsort --scale 18

# 3. geo re-run: faulted mid-sweep in battery_r3 (likely a concurrent
#    process sharing the tunnel); confirm clean on an idle chip.
run python benchmarks/run.py --algorithms geo,spgemm --rmat 16 --reorder degree

# 4. paged-spmm re-run with the K->128-lane padding fix (the original
#    arms failed real-Mosaic compile: "Slice shape along dimension 3
#    must be aligned to tiling (128), but is 32"); s16 re-validated
#    manually at 18.7 ms/pass before queueing these.
run python benchmarks/ab_paged.py paged-spmm --scale 18 --window 2048 --degsort
run python benchmarks/ab_paged.py paged-spmm --scale 20 --window 2048 --degsort --iters 3
