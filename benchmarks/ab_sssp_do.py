"""A/B: direction-optimized SSSP edge-budget sweep at scale 18 (Pallas
min-plus dense branch). One config per process (axon tunnel).

Usage: python benchmarks/ab_sssp_do.py [--edge_budget N] [--scale 18]
"""

from __future__ import annotations

import argparse
import json
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from gunrock_tpu.graph import hostcache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--edge_budget", type=int, default=None)
    p.add_argument("--num_runs", type=int, default=8)
    p.add_argument("--window", type=int, default=None)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--reorder", default="", choices=["", "degree"])
    ns = p.parse_args()

    from gunrock_tpu.algorithms.sssp import sssp_kernel_do
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.semiring import _BIG, pull_layout

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.reorder == "degree":
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    sources = np.argsort(-deg)[: ns.num_runs].tolist()
    layout = pull_layout(
        graph, window=ns.window, chunk=ns.chunk, pad_value=_BIG
    )

    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    fn = jax.jit(
        lambda g, s: sssp_kernel_do(
            g, s, layout=layout, edge_budget=ns.edge_budget
        )
    )
    dist, depth = jax.block_until_ready(fn(graph, sources[0]))
    np.asarray(dist)

    outs = []
    t0 = time.perf_counter()
    for src in sources:
        outs.append(fn(graph, src))
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / len(sources)

    reached = np.isfinite(np.asarray(outs[0][0]))
    print(
        json.dumps(
            {
                "edge_budget": ns.edge_budget or -1,
                "scale": ns.scale,
                "window": layout.window,
                "chunk": layout.chunk,
                "reorder": ns.reorder,
                "avg_ms": round(avg_ms, 3),
                "mteps": round(int(deg[reached].sum()) / avg_ms / 1000.0, 2),
                "depth": int(np.asarray(outs[0][1])),
            }
        )
    )


if __name__ == "__main__":
    main()
