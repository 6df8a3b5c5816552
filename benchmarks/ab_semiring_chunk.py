"""Chunk-size sweep for the v1 bucketed semiring SpMV kernel (scale-18
R-MAT, plus_times). One (window, chunk) config per process (axon tunnel:
one hot executable). Prints one JSON line.

Usage: python benchmarks/ab_semiring_chunk.py --chunk 512 [--window 2048]
"""

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
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--num_runs", type=int, default=10)
    p.add_argument("--reorder", default="", choices=["", "degree"])
    p.add_argument("--version", type=int, default=1)
    p.add_argument("--semiring", default="plus_times")
    ns = p.parse_args()

    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv, pull_layout

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.reorder == "degree":
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)
    pad = float("inf") if ns.semiring == "min_plus" else 0.0
    layout = pull_layout(graph, window=ns.window, chunk=ns.chunk,
                         pad_value=pad)

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.random(graph.n_vertices, dtype=np.float32))
        for _ in range(ns.num_runs)
    ]
    fn = jax.jit(
        lambda x: bucketed_semiring_spmv(
            layout, x, ns.semiring, interpret=False, version=ns.version
        )
    )
    np.asarray(jax.block_until_ready(fn(xs[0])))  # compile + real-exec mode

    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]  # vary input: no LICM, no rebinding
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / ns.num_runs

    print(
        json.dumps(
            {
                "version": ns.version,
                "semiring": ns.semiring,
                "window": ns.window,
                "chunk": ns.chunk,
                "scale": ns.scale,
                "reorder": ns.reorder,
                "n_chunks": int(layout.n_chunks),
                "avg_ms": round(avg_ms, 3),
                "gedges_per_s": round(graph.n_edges / avg_ms / 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
