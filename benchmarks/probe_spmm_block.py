"""Decompose the SpGEMM dense-block pass cost on chip.

s16 count_only = ~256 blocks x ~37 ms/pass = 9.5 s, unchanged by the
exact=True (half x-DMA) switch — so the bound is NOT the x-window DMA.
This probe times ONE bucketed SpMM pass (the per-block unit) under each
candidate variant to find the real bound:

  --variant exact|split     single-bf16 x vs hi+lo split (dense kernel)
  --variant sparse          the frontier-sparse call _run_dense now uses
  --window/--chunk          layout geometry (2048/256 default; 2048/512,
                            4096/1024 candidates)
  --k                       MXU column count (block_rows; 256 default)

One variant per process (axon executable isolation). Prints ms/pass and
the s16 full-sweep extrapolation (V/k passes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="exact",
                   choices=("exact", "split", "sparse"))
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--runs", type=int, default=5)
    ns = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm, bucketed_spmm_sparse
    from gunrock_tpu.utils.timer import force_real_execution

    g = rmat_graph(scale=ns.scale, edge_factor=16, seed=0)
    force_real_execution()
    V = g.n_vertices
    # B^T layout exactly as _run_dense builds it
    lay = build_bucketed_layout(
        hostcache.host(g, "col_indices"), hostcache.host(g, "edge_src"),
        np.ones(g.n_edges, np.float32), V,
        window=ns.window, chunk=ns.chunk,
    )
    # x = one real A row-block scattered dense (block 0: the hub rows)
    offs = hostcache.host(g, "row_offsets")
    e1 = int(offs[min(ns.k, V)])
    cols = np.asarray(hostcache.host(g, "col_indices")[:e1])
    rows = np.asarray(hostcache.host(g, "edge_src")[:e1])
    x = np.zeros((V, ns.k), np.float32)
    x[cols, rows] = 1.0
    xd = jnp.asarray(x)
    act = jnp.zeros(V, bool).at[jnp.asarray(cols)].set(True)

    if ns.variant == "sparse":
        fn = jax.jit(lambda l, x, a: bucketed_spmm_sparse(
            l, x, a, exact=True, tail_grids=(2, 4, 8, 64)))
        args = (lay, xd, act)
    else:
        ex = ns.variant == "exact"
        fn = jax.jit(lambda l, x, e=ex: bucketed_spmm(l, x, exact=e))
        args = (lay, xd)
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(ns.runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(times))
    print(json.dumps({
        "probe": "spmm_block", "variant": ns.variant, "scale": ns.scale,
        "window": ns.window, "chunk": ns.chunk, "k": ns.k,
        "n_chunks": lay.n_chunks, "ms_per_pass": round(ms, 2),
        "s16_sweep_s": round(ms * (V / ns.k) / 1e3, 2),
    }))


if __name__ == "__main__":
    main()
