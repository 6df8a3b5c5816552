"""A/B: degree-sorted relabeling (graph/reorder.py) vs random vertex
order, at a given scale (one config per process — axon tunnel
executable isolation).

Usage: python benchmarks/ab_degsort.py [--scale 18] [--algo bfs|sssp|pr]
       [--degsort]
"""

from __future__ import annotations

import argparse
import json
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--num_runs", type=int, default=8)
    p.add_argument("--algo", default="bfs", choices=("bfs", "sssp", "pr"))
    p.add_argument("--degsort", action="store_true")
    p.add_argument("--budget_div", type=int, default=0,
                   help="edge budget divisor (sssp: E//div; 0 = kernel default)")
    ns = p.parse_args()

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.semiring import pull_layout
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.degsort:
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    srcs = np.argsort(-deg)[: ns.num_runs].tolist()
    extra = {}

    if ns.algo == "bfs":
        from gunrock_tpu.algorithms.bfs import UNREACHED, bfs_kernel_do

        budget = graph.n_edges // ns.budget_div if ns.budget_div else None
        layout = pull_layout(graph, unit=True)
        fn = jax.jit(
            lambda g, s, lay: bfs_kernel_do(g, s, layout=lay, edge_budget=budget)
        )
    elif ns.algo == "sssp":
        from gunrock_tpu.algorithms.sssp import sssp_kernel_do

        budget = graph.n_edges // ns.budget_div if ns.budget_div else None
        layout = pull_layout(graph, unit=False)
        fn = jax.jit(
            lambda g, s, lay: sssp_kernel_do(g, s, layout=lay, edge_budget=budget)
        )
    else:  # pr — source ignored; num_runs timed iterations of the sweep
        from gunrock_tpu.algorithms.pr import pr_kernel_pallas

        layout = pull_layout(graph, unit=False)
        fn = jax.jit(lambda g, s, lay: pr_kernel_pallas(g, layout=lay))

    force_real_execution()
    jax.block_until_ready(fn(graph, srcs[0], layout))
    outs = []
    t0 = time.perf_counter()
    for s in srcs:
        outs.append(fn(graph, s, layout))
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / len(srcs)

    if ns.algo == "bfs":
        from gunrock_tpu.algorithms.bfs import UNREACHED

        reached = np.asarray(outs[0][0]) != int(UNREACHED)
        ev = int(deg[reached].sum())
        extra["mteps"] = round(ev / avg_ms / 1e3, 2)
    elif ns.algo == "sssp":
        reached = np.isfinite(np.asarray(outs[0][0])) & (
            np.asarray(outs[0][0]) < 1e30
        )
        ev = int(deg[reached].sum())
        extra["mteps"] = round(ev / avg_ms / 1e3, 2)

    print(json.dumps({
        "algo": ns.algo, "scale": ns.scale, "degsort": bool(ns.degsort),
        "n_chunks": layout.n_chunks, "window": layout.window,
        "avg_ms": round(avg_ms, 2), **extra,
    }))


if __name__ == "__main__":
    main()
