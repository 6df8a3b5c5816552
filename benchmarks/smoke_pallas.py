"""Hardware smoke test: compile+run every Pallas kernel path on a tiny
graph, one subprocess per kernel (axon executable isolation; a Mosaic
fault in one kernel must not sink the report for the rest).

CPU tests run the kernels in interpret mode only, so Mosaic-path
regressions can ship silently while the tunnel is down (VERDICT round-1
weakness #9) — this is the first thing the measurement battery runs when
the tunnel answers. Prints one JSON line per kernel and a final summary.

Usage: python benchmarks/smoke_pallas.py            # orchestrator
       python benchmarks/smoke_pallas.py --one NAME # single kernel
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SCALE = 10  # tiny: compile coverage, not perf


def _graph():
    from gunrock_tpu.io.generators import rmat_graph

    return rmat_graph(scale=SCALE, edge_factor=8, seed=1)


def _interp():
    """False on hardware (the whole point); honors
    GUNROCK_PALLAS_INTERPRET so the harness itself is CPU-testable."""
    from gunrock_tpu.ops.pallas import use_interpret

    return use_interpret()


def k_semiring_v1():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv, pull_layout

    g = _graph()
    lay = pull_layout(g, unit=True, interpret=_interp())
    x = jnp.ones(g.n_vertices, jnp.float32)
    for sr in ("plus_times", "min_plus", "max_times"):
        jax.block_until_ready(bucketed_semiring_spmv(lay, x, sr, interpret=_interp()))


def k_semiring_sparse():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv_sparse, pull_layout,
    )

    g = _graph()
    lay = pull_layout(g, unit=True, interpret=_interp())
    x = jnp.ones(g.n_vertices, jnp.float32)
    act = jnp.zeros(g.n_vertices, bool).at[:64].set(True)  # tail grid path
    jax.block_until_ready(
        bucketed_semiring_spmv_sparse(lay, x, act, "plus_times", out_mask=act, interpret=_interp())
    )
    jax.block_until_ready(
        bucketed_semiring_spmv_sparse(
            lay, x, jnp.ones(g.n_vertices, bool), "min_plus",
            interpret=_interp(),
        )
    )


def k_minmax():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv_sparse_minmax, pull_layout,
    )

    g = _graph()
    lay = pull_layout(g, unit=True, interpret=_interp())
    x = jnp.ones(g.n_vertices, jnp.float32)
    jax.block_until_ready(
        bucketed_semiring_spmv_sparse_minmax(
            lay, x, jnp.ones(g.n_vertices, bool), interpret=_interp()
        )
    )


def k_spmm():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.layout import layout_for_graph
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    g = _graph()
    lay = layout_for_graph(g)
    x = jnp.ones((g.n_vertices, 32), jnp.float32)
    jax.block_until_ready(bucketed_spmm(lay, x, interpret=_interp()))
    jax.block_until_ready(bucketed_spmm(lay, x, exact=True, interpret=_interp()))


def k_spmm_sparse():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.layout import layout_for_graph
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm_sparse

    g = _graph()
    lay = layout_for_graph(g)
    x = jnp.ones((g.n_vertices, 32), jnp.float32)
    act = jnp.zeros(g.n_vertices, bool).at[:64].set(True)
    jax.block_until_ready(bucketed_spmm_sparse(lay, x, act, exact=True, interpret=_interp()))
    jax.block_until_ready(
        bucketed_spmm_sparse(
            lay, x, jnp.ones(g.n_vertices, bool), exact=False,
            interpret=_interp(),
        )
    )


def k_color_greedy():
    import jax
    from gunrock_tpu.algorithms.color import (
        _greedy_color_setup, color_kernel_greedy_pallas,
    )

    g = _graph()
    lay, rank = _greedy_color_setup(g, interpret=_interp())
    colors, it = color_kernel_greedy_pallas(
        g, rank, layout=lay, interpret=_interp()
    )
    jax.block_until_ready(colors)


def k_msbfs():
    import jax, jax.numpy as jnp
    from gunrock_tpu.algorithms.bfs import msbfs_kernel

    g = _graph()
    jax.block_until_ready(
        msbfs_kernel(g, jnp.arange(8, dtype=jnp.int32), interpret=_interp())[0]
    )


def k_kcore():
    from gunrock_tpu.algorithms import kcore

    g = _graph()
    kcore.run(g, warmup=False)


def _paged_layout(pad_value=0.0):
    from gunrock_tpu.ops.pallas.paged import build_paged_layout

    g = _graph()
    lay = build_paged_layout(
        g.edge_src, g.col_indices, g.values, g.n_vertices,
        window=512, chunk=256, page=8, pad_value=pad_value,
    )
    return g, lay


def k_paged_semiring():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.paged import paged_semiring_spmv

    g, lay = _paged_layout()
    x = jnp.ones(g.n_vertices, jnp.float32)
    for sr in ("plus_times", "max_times"):
        jax.block_until_ready(
            paged_semiring_spmv(lay, x, sr, interpret=_interp())
        )


def k_paged_sparse():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.paged import paged_semiring_spmv_sparse

    g, lay = _paged_layout()
    x = jnp.ones(g.n_vertices, jnp.float32)
    act = jnp.zeros(g.n_vertices, bool).at[:64].set(True)
    jax.block_until_ready(
        paged_semiring_spmv_sparse(
            lay, x, act, "plus_times", out_mask=act, interpret=_interp()
        )
    )


def k_paged_minmax():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.paged import paged_semiring_spmv_sparse_minmax

    g, lay = _paged_layout()
    x = jnp.ones(g.n_vertices, jnp.float32)
    jax.block_until_ready(
        paged_semiring_spmv_sparse_minmax(
            lay, x, jnp.ones(g.n_vertices, bool), interpret=_interp()
        )
    )


def k_paged_spmm():
    import jax, jax.numpy as jnp
    from gunrock_tpu.ops.pallas.paged import paged_spmm, paged_spmm_sparse

    g, lay = _paged_layout()
    x = jnp.ones((g.n_vertices, 32), jnp.float32)
    jax.block_until_ready(paged_spmm(lay, x, exact=True, interpret=_interp()))
    act = jnp.zeros(g.n_vertices, bool).at[:64].set(True)
    jax.block_until_ready(
        paged_spmm_sparse(lay, x, act, exact=False, interpret=_interp())
    )


KERNELS = {
    "semiring_v1": k_semiring_v1,
    "semiring_sparse": k_semiring_sparse,
    "minmax": k_minmax,
    "spmm": k_spmm,
    "spmm_sparse": k_spmm_sparse,
    "color_greedy": k_color_greedy,
    "msbfs": k_msbfs,
    "kcore": k_kcore,
    "paged_semiring": k_paged_semiring,
    "paged_sparse": k_paged_sparse,
    "paged_minmax": k_paged_minmax,
    "paged_spmm": k_paged_spmm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--timeout", type=int, default=420)
    args = ap.parse_args()

    if args.one:
        KERNELS[args.one]()
        print(json.dumps({"kernel": args.one, "ok": True}))
        return

    results = {}
    for name in KERNELS:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=args.timeout,
            )
            ok = r.returncode == 0 and '"ok": true' in r.stdout
            results[name] = (
                "ok" if ok else (r.stderr.strip().splitlines() or ["fail"])[-1][:200]
            )
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(json.dumps({"kernel": name, "status": results[name]}), flush=True)
    n_ok = sum(1 for v in results.values() if v == "ok")
    print(json.dumps({
        "metric": "pallas_smoke", "ok": n_ok, "total": len(results),
        "failed": [k for k, v in results.items() if v != "ok"],
    }))


if __name__ == "__main__":
    main()
