#!/bin/bash
# Round-5 chip battery: remaining measurements, one subprocess per item
# (axon executable isolation). Run from repo root; appends to
# benchmarks/results_r5.jsonl via each tool's own output + this log.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/battery_r5.log
exec >> "$LOG" 2>&1
echo "=== battery_r5 $(date -u +%FT%TZ) ==="

run() {
  echo "--- $* ($(date -u +%T))"
  timeout "${T:-1800}" "$@"
  echo "--- rc=$?"
}

# 1. geo chunk-skipping number (VERDICT #10: commit aee298b unmeasured;
#    target s16 <= 5 s)
T=1800 run python benchmarks/run.py --algorithms geo --rmat 16 --reorder degree -n 1

# 2. SpGEMM bound diagnosis (VERDICT #8): the queued probe, one variant
#    per process
T=1200 run python benchmarks/probe_spmm_block.py --variant exact
T=1200 run python benchmarks/probe_spmm_block.py --variant split
T=1200 run python benchmarks/probe_spmm_block.py --variant exact --window 4096 --chunk 1024
T=1200 run python benchmarks/probe_spmm_block.py --variant exact --k 512

# 3. north stars: web spgemm + the s22 social trio (VERDICT #5)
T=1800 run python benchmarks/north_star.py web spgemm
T=3000 run python benchmarks/north_star.py social hits
T=3000 run python benchmarks/north_star.py social kcore
T=3600 run python benchmarks/north_star.py social tc

# 4. enactor-port regression checks (kcore + hits s18)
T=1200 run python benchmarks/run.py --algorithms kcore --rmat 18 --reorder degree -n 2
T=1200 run python benchmarks/run.py --algorithms hits --rmat 18 --reorder degree -n 2

# 5. coloring round-cost trace (VERDICT #2 second half)
T=1800 run python benchmarks/run.py --algorithms color --rmat 18 --reorder degree -n 1 --trace

# 6. headline refresh
T=1200 run python bench.py

echo "=== battery_r5 done $(date -u +%FT%TZ) ==="
