"""Decompose the k-core per-wave cost floor on chip.

The round-2c battery measured tail grids winning only 1.18x at s18
(2916 vs 3433 ms over ~400+ waves) where the wave simulator predicted
4-8x — so the ~7 ms/wave floor is NOT dominated by the decrement
kernel's grid size. This probe splits the floor into its parts by
timing variants of the same flat while_loop:

  full   — the shipping kernel (Pallas decrement on TPU default path)
  xla    — the XLA gather + sorted segmented count decrement
  nop    — decrement replaced by zeros(V): isolates the loop BODY cost
           (peel mask, where-updates, min-reduce, k-jump, cond switch)
           from the edge pass. Round count differs (degrees never
           drop), so compare ms/ROUND, not totals.

Usage: python benchmarks/probe_kcore_floor.py --variant full|xla|nop
       [--scale 16] [--degsort] [--runs 3]
One variant per process (axon executable isolation).
"""

from __future__ import annotations

import argparse
import json
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="full", choices=("full", "xla", "nop"))
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--degsort", action="store_true")
    p.add_argument("--runs", type=int, default=3)
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gunrock_tpu.algorithms.kcore import kcore_kernel, run
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.configs import LoadBalance, Options
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.degsort:
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)
    force_real_execution()

    import time

    if ns.variant == "nop":
        V = graph.n_vertices

        def nop_decrement(peel, alive, lay):
            return jnp.zeros(V, dtype=jnp.int32)

        fn = jax.jit(lambda g: kcore_kernel(g, nop_decrement))
        jax.block_until_ready(fn(graph))
        times = []
        for _ in range(ns.runs):
            t0 = time.perf_counter()
            cores, degen, rounds = jax.block_until_ready(fn(graph))
            times.append((time.perf_counter() - t0) * 1e3)
        rounds = int(rounds)
    else:
        opt = Options(load_balance=(
            LoadBalance.PALLAS_MERGE_PATH if ns.variant == "full"
            else LoadBalance.XLA_SEGMENT))
        times = []
        res = None
        for _ in range(ns.runs):
            res = run(graph, options=opt)
            times.append(res.elapsed_ms)
        rounds = res.rounds

    avg = float(np.mean(times))
    print(json.dumps({
        "probe": "kcore_floor", "variant": ns.variant, "scale": ns.scale,
        "degsort": bool(ns.degsort),
        "tail_grids": os.environ.get("GUNROCK_TAIL_GRIDS", "8,64"),
        "avg_ms": round(avg, 2), "rounds": rounds,
        "ms_per_round": round(avg / max(rounds, 1), 3),
    }))


if __name__ == "__main__":
    main()
