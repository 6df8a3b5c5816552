"""Multi-damping PageRank sweep measurement: K damping factors in one
bucketed-SpMM batch vs the single-alpha Pallas kernel run K times
(amortization of the windowed one-hot masks across the K axis).

One variant per process (axon tunnel). Prints one JSON line.

Usage: python benchmarks/ab_pr_batch.py {batch|single} [--k 8 --scale 16]
"""

from __future__ import annotations

import argparse
import json
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("variant", choices=["batch", "single"])
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--tol", type=float, default=1e-5)
    ns = p.parse_args()

    from gunrock_tpu.algorithms.pr import pr_batch_kernel_spmm, pr_kernel_pallas
    from gunrock_tpu.io.generators import rmat_graph

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    alphas = np.linspace(0.75, 0.95, ns.k).astype(np.float32)

    if ns.variant == "batch":
        # layout build is host-side: must precede tracing
        jax.block_until_ready(
            pr_batch_kernel_spmm(graph, alphas, tol=ns.tol, interpret=False,
                                 max_iterations=1)[0]
        )
        from gunrock_tpu.utils.timer import force_real_execution

        force_real_execution()
        fn = jax.jit(
            lambda a: pr_batch_kernel_spmm(graph, a, tol=ns.tol, interpret=False)
        )
        p_, it = jax.block_until_ready(fn(alphas))
        np.asarray(p_)  # real-exec mode
        t0 = time.perf_counter()
        p_, it = jax.block_until_ready(fn(alphas))
        ms = (time.perf_counter() - t0) * 1e3
        iters = int(it)
    else:
        from gunrock_tpu.ops.pallas.semiring import pull_layout

        layout = pull_layout(graph)
        fn = jax.jit(
            lambda a: pr_kernel_pallas(
                graph, a, tol=ns.tol, interpret=False, layout=layout
            )
        )
        p_, it = jax.block_until_ready(fn(float(alphas[0])))
        np.asarray(p_)
        outs = []
        t0 = time.perf_counter()
        for a in alphas:
            outs.append(fn(float(a)))
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) * 1e3
        iters = int(outs[-1][1])

    print(
        json.dumps(
            {
                "variant": ns.variant,
                "k": ns.k,
                "scale": ns.scale,
                "total_ms": round(ms, 3),
                "ms_per_alpha": round(ms / ns.k, 3),
                "iterations": iters,
            }
        )
    )


if __name__ == "__main__":
    main()
