#!/bin/bash
# Round-3 measurement battery — runs AFTER battery_r2c.sh (which captures
# the round-2 backlog). Each measurement is its own process (tunnel
# executable isolation). Appends JSON lines to benchmarks/results_r3.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_r3.jsonl
run() {
  echo "== $*" >&2
  timeout 1200 "$@" | tee -a "$OUT"
}

# 1. Frontier-sparse tail-slot fix sanity: the multi-row-block partial
#    frontier case the advisor flagged (stale VMEM flush over chunk 0's
#    row block) — smoke_pallas covers all kernels; a FAIL here means the
#    perm-aliasing fix regressed something on real Mosaic.
run python benchmarks/smoke_pallas.py

# 2. Batched-K PageRank public API: K=8 sweep vs 8 sequential runs
#    (round-2 A/B measured 2.5x per alpha; now productized as run_batch)
run python benchmarks/ab_pr_batch.py batch --k 8 --scale 16
run python benchmarks/ab_pr_batch.py single --k 8 --scale 16

# 3. BC XLA path after the dynamic-range fix (segment_sum scatter
#    replaced the cumsum-difference): quantify the XLA-path cost; the
#    default Pallas path is untouched
run python benchmarks/run.py --algorithms bc --rmat 16 --reorder degree --load_balance xla_segment

# 4. Roofline columns on the full sweep (every row now carries
#    model_mb/gbps/pct_stream — the BASELINE MFU column)
run python benchmarks/run.py --all --rmat 16 --reorder degree

# 5. Regression-family chip smoke: delaunay (deep mesh — exercises the
#    tail grids + BC fix on hardware) and sbm (community locality)
run python benchmarks/run.py --algorithms bfs,sssp,bc --market datasets/delaunay2k.mtx
run python benchmarks/run.py --algorithms bfs,pr,color --market datasets/sbm2k.mtx

# 6. Paged-metadata kernel (the SMEM-wall escape hatch, design.md §12).
#    First Mosaic compile check at small scale, then the predicted-win
#    points: s20 degsort W=2048 paged (frag x W 4.0K) vs auto SMEM
#    (6.5K), and the s22 capability point W=4096 (7.3K vs 25.8K).
run python benchmarks/ab_paged.py paged --scale 16 --window 2048
run python benchmarks/ab_paged.py smem  --scale 16
run python benchmarks/ab_paged.py paged --scale 20 --window 2048 --degsort
run python benchmarks/ab_paged.py paged --scale 20 --window 4096 --degsort
run python benchmarks/ab_paged.py smem  --scale 20 --degsort
run python benchmarks/ab_paged.py paged --scale 22 --window 4096 --degsort --iters 3
run python benchmarks/ab_paged.py smem  --scale 22 --degsort --iters 3

# 7. Sparse paged path end-to-end: BFS at s20/s22 with paged layouts
#    (GUNROCK_PAGED_META=1 pages metadata instead of doubling W above
#    the SMEM budget). Compare against the battery's SMEM rows above.
GUNROCK_PAGED_META=1 run python benchmarks/run.py --algorithms bfs,sssp --rmat 20 --reorder degree
GUNROCK_PAGED_META=1 run python benchmarks/big_scale.py --algo bfs --scale 22 --degsort --num_runs 2

# 8. Async sweep solver on chip: the high-diameter case BSP cannot touch
#    (grid2048 = 4094 BSP levels; sweeps converge in a handful) + the
#    power-law sanity point. Work metric: block passes / n_blocks.
run python -m gunrock_tpu.examples.sssp --market datasets/grid64.mtx --src 0 --mode async --validate
run python benchmarks/ab_async.py --side 512
run python benchmarks/ab_async.py --side 2048

# 9. Paged SpMM: the batch family at paged scale (msbfs/bc_batch/
#    pr_batch dense passes). K=32 A/B vs the SMEM SpMM at s18/s20.
run python benchmarks/ab_paged.py paged-spmm --scale 18 --window 2048 --degsort
run python benchmarks/ab_paged.py smem-spmm  --scale 18 --degsort
run python benchmarks/ab_paged.py paged-spmm --scale 20 --window 2048 --degsort --iters 3
run python benchmarks/ab_paged.py smem-spmm  --scale 20 --degsort --iters 3
