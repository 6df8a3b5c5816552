"""A/B: snake-order dense semiring pass vs the SMEM-grid v5 pass.

The snake kernel's claim: x-window traffic / G (probe_v5_floor showed
the v5 pass is DMA-bound). One config per process.

Usage: python benchmarks/ab_snake.py [--scale 18] [--group 8] ...
"""
from __future__ import annotations

import argparse, json, time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax, jax.numpy as jnp, numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--page", type=int, default=512)
    p.add_argument("--group", type=int, default=8)
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--num_runs", type=int, default=10)
    p.add_argument("--reorder", default="degree", choices=["", "degree"])
    ns = p.parse_args()

    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.graph.reorder import degree_sort
    from gunrock_tpu.ops.pallas.paged import (build_snake_layout,
                                              snake_semiring_spmv)
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.reorder == "degree":
        graph, _ = degree_sort(graph)
    pv = float("inf") if ns.semiring == "min_plus" else 0.0
    lay = build_snake_layout(
        np.asarray(graph.col_indices), np.asarray(graph.edge_src),
        np.asarray(graph.values), graph.n_vertices,
        window=ns.window, chunk=ns.chunk, page=ns.page, group=ns.group,
        pad_value=pv,
    )
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.random(graph.n_vertices, dtype=np.float32))
          for _ in range(ns.num_runs)]
    fn = jax.jit(lambda x: snake_semiring_spmv(lay, x, ns.semiring))
    force_real_execution()
    jax.block_until_ready(fn(xs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / ns.num_runs
    print(json.dumps({
        "ab": "snake", "semiring": ns.semiring, "scale": ns.scale,
        "window": ns.window, "chunk": ns.chunk, "group": ns.group,
        "n_chunks": int(lay.n_chunks), "avg_ms": round(avg_ms, 3),
        "gedges_per_s": round(graph.n_edges / avg_ms / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
