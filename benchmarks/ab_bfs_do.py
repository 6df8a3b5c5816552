"""A/B: direction-optimized BFS dense-pull backend at scale 18.

Variants: xla (cumsum pull pass) vs pallas (doubly-masked frontier-sparse
max_times kernel). One variant per process (axon tunnel: one hot
executable). Prints one JSON line.

Usage: python benchmarks/ab_bfs_do.py {xla|pallas} [--scale 18]
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
    p.add_argument("variant", choices=["xla", "pallas"])
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--edge_factor", type=int, default=16)
    p.add_argument("--num_runs", type=int, default=8)
    p.add_argument("--edge_budget", type=int, default=None)
    ns = p.parse_args()

    from gunrock_tpu.algorithms.bfs import UNREACHED, bfs_kernel_do
    from gunrock_tpu.io.generators import rmat_graph

    graph = rmat_graph(scale=ns.scale, edge_factor=ns.edge_factor, seed=1)
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    sources = np.argsort(-deg)[: ns.num_runs].tolist()

    layout = None
    if ns.variant == "pallas":
        from gunrock_tpu.ops.pallas.semiring import pull_layout

        layout = pull_layout(graph, unit=True)

    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    fn = jax.jit(
        lambda g, s: bfs_kernel_do(
            g, s, layout=layout, edge_budget=ns.edge_budget
        )
    )
    dist, depth = jax.block_until_ready(fn(graph, sources[0]))

    outs = []
    t0 = time.perf_counter()
    for src in sources:
        outs.append(fn(graph, src))
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / len(sources)

    mteps = []
    for (dist, depth), src in zip(outs, sources):
        reached = np.asarray(dist) != int(UNREACHED)
        mteps.append(int(deg[reached].sum()) / avg_ms / 1000.0)

    print(
        json.dumps(
            {
                "variant": ns.variant,
                "scale": ns.scale,
                "avg_ms": round(avg_ms, 3),
                "mteps": round(float(np.mean(mteps)), 2),
                "depth": int(np.asarray(outs[0][1])),
            }
        )
    )


if __name__ == "__main__":
    main()
