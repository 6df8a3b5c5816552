"""A/B: Gauss-Seidel sweep solver vs BSP direction-optimized SSSP/BFS
on high-diameter grids (the async runtime's reason to exist: a side-S
grid costs 2(S-1) BSP levels but a handful of sweeps).

Usage: python benchmarks/ab_async.py --side 512 [--n_blocks 32]
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
    p.add_argument("--side", type=int, default=512)
    p.add_argument("--n_blocks", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    ns = p.parse_args(argv)

    import jax

    from gunrock_tpu.experimental.async_sweep import sssp_async
    from gunrock_tpu.algorithms import sssp as bsp_sssp
    from gunrock_tpu.io.generators import grid2d_graph
    from gunrock_tpu.utils.timer import force_real_execution

    g = grid2d_graph(ns.side, weighted=True)
    force_real_execution()

    # async sweeps
    d, sweeps, passes = sssp_async(g, 0, n_blocks=ns.n_blocks)  # warm
    t0 = time.perf_counter()
    for _ in range(ns.iters):
        d, sweeps, passes = sssp_async(g, 0, n_blocks=ns.n_blocks)
    async_ms = (time.perf_counter() - t0) * 1e3 / ns.iters

    # BSP reference (direction-optimized)
    r = bsp_sssp.run(g, 0)  # warm + timed internally
    t0 = time.perf_counter()
    for _ in range(ns.iters):
        r = bsp_sssp.run(g, 0, warmup=False)
    bsp_ms = (time.perf_counter() - t0) * 1e3 / ns.iters

    ok = bool(np.allclose(np.asarray(d), np.asarray(r.distances),
                          rtol=1e-4, atol=1e-4, equal_nan=True))
    print(json.dumps({
        "ab": "async_sweep",
        "side": ns.side,
        "n_vertices": g.n_vertices,
        "n_edges": g.n_edges,
        "async_ms": round(async_ms, 2),
        "sweeps": sweeps,
        "full_pass_eq": round(passes / ns.n_blocks, 1),
        "bsp_ms": round(bsp_ms, 2),
        "bsp_levels": int(r.search_depth),
        "speedup": round(bsp_ms / async_ms, 2) if async_ms > 0 else 0.0,
        "match": ok,
    }))


if __name__ == "__main__":
    main()
