"""Large-scale single-chip spot benchmark: one algorithm per process.

Usage: python benchmarks/big_scale.py --algo bfs|sssp|pr|kcore --scale 20

Runs the algorithm's fastest measured configuration (the Pallas paths
with `auto_window_chunk` layouts) on an R-MAT graph and prints one JSON
line. Per-process isolation avoids the multi-Pallas-executable device
faults (CLAUDE.md gotchas)."""

from __future__ import annotations

import argparse
import json
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", required=True)
    p.add_argument("--scale", type=int, default=20)
    p.add_argument("--edge_factor", type=int, default=16)
    p.add_argument("--num_runs", type=int, default=4)
    p.add_argument("--degsort", action="store_true",
                   help="degree-sorted vertex relabeling (graph/reorder.py)")
    ns = p.parse_args()

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.utils.timer import force_real_execution

    t0 = time.perf_counter()
    graph = rmat_graph(scale=ns.scale, edge_factor=ns.edge_factor, seed=1)
    gen_s = time.perf_counter() - t0
    if ns.degsort:
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ro = degree_sort(graph)
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    srcs = np.argsort(-deg)[: ns.num_runs].tolist()
    out = {"algo": ns.algo, "scale": ns.scale, "n_edges": graph.n_edges,
           "gen_s": round(gen_s, 1), "degsort": bool(ns.degsort)}

    force_real_execution()

    if ns.algo == "bfs":
        from gunrock_tpu.algorithms.bfs import UNREACHED, bfs_kernel_do
        from gunrock_tpu.ops.pallas.semiring import pull_layout

        layout = pull_layout(graph, unit=True)
        fn = jax.jit(lambda g, s, lay: bfs_kernel_do(g, s, layout=lay))
        jax.block_until_ready(fn(graph, srcs[0], layout))
        outs = []
        t0 = time.perf_counter()
        for s in srcs:
            outs.append(fn(graph, s, layout))
        jax.block_until_ready(outs)
        avg_ms = (time.perf_counter() - t0) * 1e3 / len(srcs)
        reached = np.asarray(outs[0][0]) != int(UNREACHED)
        ev = int(deg[reached].sum())
        out.update(avg_ms=round(avg_ms, 2), mteps=round(ev / avg_ms / 1e3, 2),
                   depth=int(np.asarray(outs[0][1])))
    elif ns.algo == "sssp":
        from gunrock_tpu.algorithms.sssp import sssp_kernel_do
        from gunrock_tpu.ops.pallas.semiring import _BIG, pull_layout

        layout = pull_layout(graph, pad_value=_BIG)
        fn = jax.jit(lambda g, s, lay: sssp_kernel_do(g, s, layout=lay))
        jax.block_until_ready(fn(graph, srcs[0], layout))
        outs = []
        t0 = time.perf_counter()
        for s in srcs:
            outs.append(fn(graph, s, layout))
        jax.block_until_ready(outs)
        avg_ms = (time.perf_counter() - t0) * 1e3 / len(srcs)
        reached = np.isfinite(np.asarray(outs[0][0]))
        ev = int(deg[reached].sum())
        out.update(avg_ms=round(avg_ms, 2), mteps=round(ev / avg_ms / 1e3, 2),
                   depth=int(np.asarray(outs[0][1])))
    elif ns.algo == "pr":
        from gunrock_tpu.algorithms.pr import pr_kernel_pallas
        from gunrock_tpu.ops.pallas.semiring import pull_layout

        layout = pull_layout(graph)
        fn = jax.jit(lambda g, lay: pr_kernel_pallas(g, 0.85, 1e-6, 10_000,
                                                     layout=lay))
        jax.block_until_ready(fn(graph, layout))
        t0 = time.perf_counter()
        pvec, it = jax.block_until_ready(fn(graph, layout))
        avg_ms = (time.perf_counter() - t0) * 1e3
        out.update(avg_ms=round(avg_ms, 2), iterations=int(it))
    elif ns.algo == "kcore":
        from gunrock_tpu.algorithms import kcore

        res = kcore.run(graph)
        out.update(avg_ms=round(res.elapsed_ms, 2), degeneracy=res.degeneracy)
    else:
        raise SystemExit(f"unknown algo {ns.algo}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
