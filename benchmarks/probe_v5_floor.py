"""Decompose the v5 dense semiring pass (13.2 ms @ s18 degsort) into
DMA / gather / scatter components — the measured decomposition VERDICT
round-3 #2 asks for ("prove where the remaining 5x to the ~2.5 ms
streaming floor lives").

Variants (one jitted executable per process run, axon gotchas):
  dma      edges+x blocks stream through the grid; kernel sums val only
           (no gather, no scatter) -> pure pipeline/DMA floor
  gather   + dynamic-gather of x (no scatter; sum of messages)
  full     the real v5 kernel (gather + MXU scatter)

Usage: python benchmarks/probe_v5_floor.py [--variant dma|gather|full]
       python benchmarks/probe_v5_floor.py --all   # subprocess driver
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import functools


def run_variant(variant: str, scale: int, window: int, chunk: int,
                num_runs: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gunrock_tpu.graph.reorder import degree_sort
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.semiring import (
        _compute_chunk_v4, _gather_window_dyn, bucketed_semiring_spmv,
        pull_layout)
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=scale, edge_factor=16, seed=1)
    graph, _ = degree_sort(graph)
    layout = pull_layout(graph, window=window, chunk=chunk)
    W, C = layout.window, layout.chunk
    S = W // 128
    Cr = C // 128
    n_chunks = layout.n_chunks
    V = layout.n_vertices

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.random(V, dtype=np.float32))
          for _ in range(num_runs)]

    if variant == "full":
        fn = jax.jit(lambda x: bucketed_semiring_spmv(
            layout, x, "plus_times", version=5))
    else:
        def make_kernel():
            def kernel(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
                i = pl.program_id(0)
                first_visit = jnp.logical_or(
                    i == 0,
                    pk_ref[i] // 65536
                    != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
                )

                @pl.when(first_visit)
                def _():
                    y_ref[...] = jnp.zeros_like(y_ref)

                val2 = val_ref[0]
                if variant == "dma":
                    # consume every operand cheaply: one add per element
                    t = jnp.sum(val2) + jnp.sum(
                        (row_ref[0] + col_ref[0]).astype(jnp.float32)
                    ) * 0.0
                    y_ref[0] = y_ref[0] + t * jnp.float32(1e-30)
                else:  # gather
                    xg = _gather_window_dyn(x_ref[0], col_ref[0], S)
                    t = jnp.sum(val2 * xg) + jnp.sum(
                        row_ref[0].astype(jnp.float32)
                    ) * 0.0
                    y_ref[0] = y_ref[0] + t * jnp.float32(1e-30)

            return kernel

        @functools.partial(jax.jit)
        def fn(x):
            x_pad = jnp.zeros(layout.n_col_blocks * W, jnp.float32).at[:V].set(x)
            x3 = x_pad.reshape(layout.n_col_blocks, S, 128)
            mshape = (n_chunks, Cr, 128)
            row2 = layout.row_local.reshape(mshape)
            col2 = layout.col_local.reshape(mshape)
            val2 = layout.values.reshape(mshape)
            pk = layout.chunk_rb * 65536 + layout.chunk_cb
            mblock = (1, Cr, 128)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((1, S, 128),
                                 lambda i, pk: (pk[i] % 65536, 0, 0)),
                    pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
                    pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
                    pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)
                ),
            )
            return pl.pallas_call(
                make_kernel(),
                out_shape=jax.ShapeDtypeStruct(
                    (layout.n_row_blocks, S, 128), jnp.float32),
                grid_spec=grid_spec,
            )(pk, x3, row2, col2, val2)

    force_real_execution()
    jax.block_until_ready(fn(xs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs]
    jax.block_until_ready(outs)
    avg_ms = (time.perf_counter() - t0) * 1e3 / num_runs
    bytes_pass = n_chunks * (C * 12 + W * 4 + W * 4)  # edges + x + y blocks
    print(json.dumps({
        "probe": "v5_floor", "variant": variant, "scale": scale,
        "window": window, "chunk": chunk, "n_chunks": int(n_chunks),
        "avg_ms": round(avg_ms, 3),
        "gedges_per_s": round(graph.n_edges / avg_ms / 1e6, 3),
        "gbps_blocks": round(bytes_pass / (avg_ms / 1e3) / 1e9, 2),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--num_runs", type=int, default=10)
    ns = p.parse_args()
    if ns.all:
        for v in ("dma", "gather", "full"):
            r = subprocess.run(
                [sys.executable, __file__, "--variant", v,
                 "--scale", str(ns.scale), "--window", str(ns.window),
                 "--chunk", str(ns.chunk)],
                capture_output=True, text=True, timeout=1200,
            )
            out = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(out[-1] if out
                  else json.dumps({"variant": v, "error":
                                   (r.stderr or "?").strip()[-200:]}),
                  flush=True)
        return
    run_variant(ns.variant, ns.scale, ns.window, ns.chunk, ns.num_runs)


if __name__ == "__main__":
    main()
