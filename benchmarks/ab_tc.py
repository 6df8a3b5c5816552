"""TC sort-join breakdown: full per-vertex-counts kernel vs total-only
(no scatters) — isolates the cost of the three scatter-adds vs the sort.

One variant per process (axon tunnel). Prints one JSON line.

Usage: python benchmarks/ab_tc.py {counts|total} [--scale 16]
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
    p.add_argument("variant", choices=["counts", "total"])
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--num_runs", type=int, default=3)
    ns = p.parse_args()

    from gunrock_tpu.algorithms.tc import (
        build_dag,
        build_wedges,
        tc_kernel_sortjoin,
        tc_total_sortjoin,
    )
    from gunrock_tpu.io.generators import rmat_graph

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    dag_offsets, dag_adj, edge_u, edge_v, udeg = build_dag(graph)
    wv, ww, wu = build_wedges(dag_offsets, dag_adj, edge_u, edge_v, udeg)
    eu, ev = jnp.asarray(edge_u), jnp.asarray(edge_v)
    wvj, wwj, wuj = jnp.asarray(wv), jnp.asarray(ww), jnp.asarray(wu)

    if ns.variant == "counts":
        fn = jax.jit(
            lambda a, b, c, d, e: tc_kernel_sortjoin(graph.n_vertices, a, b, c, d, e)
        )
        args = (eu, ev, wvj, wwj, wuj)
        out = jax.block_until_ready(fn(*args))
        np.asarray(out)  # real-exec mode
        t0 = time.perf_counter()
        for _ in range(ns.num_runs):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / ns.num_runs
        total = int(jnp.sum(out))
    else:
        fn = jax.jit(tc_total_sortjoin)
        args = (eu, ev, wvj, wwj, wuj)
        out = jax.block_until_ready(fn(*args))
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(ns.num_runs):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / ns.num_runs
        total = int(out) * 3  # matches the per-corner membership total

    print(
        json.dumps(
            {
                "variant": ns.variant,
                "scale": ns.scale,
                "avg_ms": round(ms, 3),
                "membership_total": total,
                "n_sort": int(eu.shape[0] + wv.shape[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
