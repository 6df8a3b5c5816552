"""A/B: paged-metadata semiring kernel vs the SMEM scalar-prefetch
kernel (ops/pallas/paged.py vs semiring.bucketed_semiring_spmv).

The paged kernel unlocks windows whose chunk metadata exceeds the 1 MB
SMEM budget; host math (docs/design.md §12) predicts ~3.8x per pass at
s22+degsort (W=2048: 6.8K compare-ops/edge vs the SMEM-feasible
W=16384: 25.8K). This measures real pass time for both kernels at
chosen (scale, W, C) points — one variant per process (axon executable
isolation).

Usage:
  python benchmarks/ab_paged.py paged --scale 20 --window 2048 --chunk 256
  python benchmarks/ab_paged.py smem  --scale 20            # auto W
  python benchmarks/ab_paged.py paged --scale 22 --window 4096 --degsort
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("variant", choices=("paged", "smem", "paged-spmm", "smem-spmm"))
    p.add_argument("--scale", type=int, default=20)
    p.add_argument("--edge_factor", type=int, default=16)
    p.add_argument("--window", type=int, default=0, help="0 = auto")
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--page", type=int, default=512)
    p.add_argument("--degsort", action="store_true")
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--k", type=int, default=32, help="SpMM batch width")
    p.add_argument("--iters", type=int, default=8)
    ns = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.utils.timer import force_real_execution

    interp = use_interpret()

    g = rmat_graph(scale=ns.scale, edge_factor=ns.edge_factor, seed=1)
    if ns.degsort:
        from gunrock_tpu.graph.reorder import degree_sort

        g, _ = degree_sort(g)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    x = jnp.asarray(
        np.random.default_rng(0).random(g.n_vertices).astype(np.float32)
    )
    force_real_execution()

    if ns.variant.endswith("spmm"):
        import jax.numpy as _jnp

        x = _jnp.asarray(np.random.default_rng(0).random(
            (g.n_vertices, ns.k)).astype(np.float32))
    if ns.variant == "paged-spmm":
        from gunrock_tpu.ops.pallas.paged import build_paged_layout, paged_spmm

        if ns.window == 0:
            ns.window = 2048
        t0 = time.perf_counter()
        lay = build_paged_layout(rows, cols, vals, g.n_vertices,
                                 window=ns.window, chunk=ns.chunk,
                                 page=ns.page)
        build_s = time.perf_counter() - t0
        fn = lambda xx: paged_spmm(lay, xx, interpret=interp)
        n_chunks = lay.n_chunks
        W = ns.window
    elif ns.variant == "smem-spmm":
        from gunrock_tpu.ops.pallas.layout import (build_auto_layout,
                                                   build_bucketed_layout)
        from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

        t0 = time.perf_counter()
        if ns.window:
            lay = build_bucketed_layout(rows, cols, vals, g.n_vertices,
                                        window=ns.window, chunk=ns.chunk)
        else:
            lay = build_auto_layout(rows, cols, vals, g.n_vertices)
        build_s = time.perf_counter() - t0
        fn = lambda xx: bucketed_spmm(lay, xx, interpret=interp)
        n_chunks = lay.n_chunks
        W = lay.window
    elif ns.variant == "paged":
        from gunrock_tpu.ops.pallas.paged import (build_paged_layout,
                                                  paged_semiring_spmv)

        if ns.window == 0:
            ns.window = 2048
        t0 = time.perf_counter()
        lay = build_paged_layout(rows, cols, vals, g.n_vertices,
                                 window=ns.window, chunk=ns.chunk,
                                 page=ns.page)
        build_s = time.perf_counter() - t0
        fn = lambda xx: paged_semiring_spmv(lay, xx, ns.semiring,
                                            interpret=interp)
        n_chunks = lay.n_chunks
        W = ns.window
    else:
        from gunrock_tpu.ops.pallas.layout import (build_auto_layout,
                                                   build_bucketed_layout)
        from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv

        t0 = time.perf_counter()
        if ns.window:
            lay = build_bucketed_layout(rows, cols, vals, g.n_vertices,
                                        window=ns.window, chunk=ns.chunk)
        else:
            lay = build_auto_layout(rows, cols, vals, g.n_vertices)
        build_s = time.perf_counter() - t0
        fn = lambda xx: bucketed_semiring_spmv(lay, xx, ns.semiring,
                                               interpret=interp)
        n_chunks = lay.n_chunks
        W = lay.window

    y = jax.block_until_ready(fn(x))  # compile + warm
    # LICM guard: vary the operand through the timed loop
    xs = [x * (1.0 + 0.001 * k) for k in range(ns.iters)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [fn(xx) for xx in xs]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) * 1e3 / ns.iters

    E = g.n_edges
    print(json.dumps({
        "ab": "paged_semiring",
        "variant": ns.variant,
        "scale": ns.scale,
        "degsort": ns.degsort,
        "window": W,
        "chunk": ns.chunk,
        "n_chunks": int(n_chunks),
        "frag": round(float(n_chunks) * ns.chunk / E, 3),
        "semiring": ns.semiring,
        "pass_ms": round(ms, 3),
        "medges_per_s": round(E / ms / 1000.0, 2),
        "layout_build_s": round(build_s, 2),
    }))


if __name__ == "__main__":
    main()
