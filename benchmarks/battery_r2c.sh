#!/bin/bash
# Round-2 continuation measurement battery — run when the axon tunnel is
# live. Each measurement is its own process (tunnel executable isolation;
# Pallas multi-executable faults). Appends JSON lines to
# benchmarks/results_r2c.jsonl. Ordered by VALUE-per-minute: a flaky
# tunnel should still capture the session-3/4 landings before the long
# SpGEMM/TC/sort tail.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_r2c.jsonl
run() {
  echo "== $*" >&2
  timeout 1200 "$@" | tee -a "$OUT"
}

# 0. Mosaic health: compile every Pallas kernel path on hardware first
#    (CPU CI runs interpret mode only; a Mosaic break ships silently).
#    Covers the NEW session-4 kernels: spmm_sparse, tail grids, greedy.
run python benchmarks/smoke_pallas.py

# 1. headline refresh (hub degsort + E/512 budget + exact-bf16 msbfs)
run python bench.py

# 2. tail-grid dispatch A/B — k-core is the cleanest round-floor-bound
#    workload (sim: s18 = 424 waves, 1.7 full-pass equivalents, 408
#    waves fit the /64 grid -> predicts ~4-8x from 2.61 s)
GUNROCK_TAIL_GRIDS="" run python benchmarks/run.py --algorithms kcore --rmat 16 --reorder degree
GUNROCK_TAIL_GRIDS="8,64" run python benchmarks/run.py --algorithms kcore --rmat 16 --reorder degree
GUNROCK_TAIL_GRIDS="" run python benchmarks/run.py --algorithms kcore --rmat 18 --reorder degree
GUNROCK_TAIL_GRIDS="8,64" run python benchmarks/run.py --algorithms kcore --rmat 18 --reorder degree

# 3. spec-greedy coloring (sim: s18 128 colors/73 rounds/11.3 full-pass
#    equivalents vs rank-JP 831 colors/114 passes; expect ~1-1.5 s at s18)
run python benchmarks/ab_color_strategy.py --strategy greedy --degsort --scale 16
run python benchmarks/ab_color_strategy.py --strategy rank --degsort --scale 16
run python benchmarks/ab_color_strategy.py --strategy greedy --degsort --scale 18
run python benchmarks/ab_color_strategy.py --strategy rank --degsort --scale 18

# 4. session-4 algorithm reworks at s16 (fast, one process each)
run python benchmarks/run.py --algorithms mst --rmat 16 --reorder degree
run python benchmarks/run.py --algorithms bc --rmat 16 --reorder degree
run python benchmarks/run.py --algorithms bc --rmat 16 --reorder degree --load_balance xla_segment
run python benchmarks/run.py --algorithms ppr --rmat 16 --reorder degree
run python benchmarks/run.py --algorithms ppr --rmat 16 --reorder degree --load_balance xla_segment

# 5. SpMV window sweep under degsort (host model predicts W=1024 ~20% win
#    at s18: 17.4G vs 21.6G compare-ops at frag 2.15 vs 1.34)
run python benchmarks/ab_semiring_chunk.py --window 1024 --chunk 256 --reorder degree
run python benchmarks/ab_semiring_chunk.py --window 2048 --chunk 256 --reorder degree
run python benchmarks/ab_semiring_chunk.py --window 1024 --chunk 512 --reorder degree

# 6. SSSP dense-pull window sweep under degsort — W=1024 cuts the
#    per-round compare cost ~20%; the s18 plateau is 111 ms over ~7
#    rounds, so this may cross VERDICT's <=100 ms target
run python benchmarks/ab_sssp_do.py --reorder degree --edge_budget 20520 --window 1024 --chunk 256
run python benchmarks/ab_sssp_do.py --reorder degree --edge_budget 20520 --window 2048 --chunk 256
run python benchmarks/ab_sssp_do.py --reorder degree --edge_budget 20520 --window 1024 --chunk 512

# 7. TC sort-join after 2-key/low-bit packing (was 3.70 s at s18 3-key/3-op)
run python benchmarks/ab_tc.py total --scale 16
run python benchmarks/ab_tc.py counts --scale 16
run python benchmarks/ab_tc.py total --scale 18
run python benchmarks/ab_tc.py counts --scale 18

# 8. sort throughput (TC/ESC cost model; is the 2-pass radix trick faster?)
run python benchmarks/probe_sort.py --sizes 1000000,10000000,100000000

# 9. SpGEMM strategy A/B at s16 (ESC was 130.5 s pre-fixes; the cumsum
#    segment-ids + deferred syncs + gather-free expansion should land
#    ~10-20 s; dense predicted ~9-12 s at 512 SpMM passes)
run python benchmarks/ab_spgemm.py esc --scale 16
run python benchmarks/ab_spgemm.py dense --scale 16
run python benchmarks/ab_spgemm.py esc --scale 16 --reorder degree
run python benchmarks/ab_spgemm.py dense --scale 16 --reorder degree
run python benchmarks/ab_spgemm.py dense --scale 16 --block-rows 256

# 10. MST/greedy at s18, tail-grid headline guard (cheap closers)
run python benchmarks/run.py --algorithms mst --rmat 18 --reorder degree
GUNROCK_TAIL_GRIDS="" run python bench.py

# 11. scale-22 capability probe (67M edges single chip; W=16384 layout —
#     expect ~15-20 MTEPS BFS if the SMEM/VMEM math holds)
run python benchmarks/big_scale.py --algo bfs --scale 22 --degsort --num_runs 2

# 12. lex-2pass sort strategy on the REAL workloads (probe #8 gives the
#     isolated throughputs; these A/B the end-to-end TC/SpGEMM effect)
GUNROCK_LEX2PASS=1 run python benchmarks/ab_tc.py total --scale 16
GUNROCK_LEX2PASS=1 run python benchmarks/ab_tc.py counts --scale 16
GUNROCK_LEX2PASS=1 run python benchmarks/ab_spgemm.py esc --scale 16
