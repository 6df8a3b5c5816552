"""Multi-chip scaling-efficiency harness.

Measures edges/s for the distributed kernels on 1, 2, 4, ... n devices
and reports efficiency vs the single-device rate — the BASELINE.md
"edges/s scaling efficiency (1 chip -> 1 host -> N hosts) >= 70%"
protocol. On a machine without multiple TPU chips it runs on the virtual
CPU mesh (pass --cpu N) — that validates the harness and the SPMD code
path; real numbers need a pod slice (run there unchanged: the mesh picks
up every device jax.distributed exposes).

Usage:
    python benchmarks/scaling.py --cpu 8 --rmat 14
    python benchmarks/scaling.py --rmat 20          # on a pod slice
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", type=int, default=0,
                   help="force a virtual CPU mesh with this many devices")
    p.add_argument("--rmat", type=int, default=14)
    p.add_argument("--edge_factor", type=int, default=16)
    p.add_argument("--algorithm", default="pagerank",
                   choices=["bfs", "sssp", "pagerank", "spmv"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--scheme", default="sharded", choices=["sharded"],
                   help="vertex-sharded state + boundary exchange (memory 1/n)")
    p.add_argument("--halo", default="auto", choices=["auto", "on", "off"],
                   help="boundary exchange mode for the sharded scheme")
    ns = p.parse_args(argv)

    if ns.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ns.cpu}"
        ).strip()
    import jax

    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.parallel import sharded
    from gunrock_tpu.parallel.mesh import make_mesh

    graph = rmat_graph(scale=ns.rmat, edge_factor=ns.edge_factor, seed=1)
    E = graph.n_edges
    total_devices = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total_devices]

    base_rate = None
    for n in sizes:
        mesh = make_mesh(n)
        coll_bytes = 0
        if ns.scheme == "sharded":
            use_halo = None if ns.halo == "auto" else (ns.halo == "on")
            pg = sharded.partition_sharded(graph, n, mesh, use_halo=use_halo)
            coll_bytes = sharded.collective_bytes_per_exchange(pg)
            if ns.algorithm == "pagerank":
                fn = lambda: sharded.pagerank(pg, mesh, max_iterations=20, tol=0.0)
            elif ns.algorithm == "bfs":
                fn = lambda: sharded.bfs(pg, 0, mesh)
            elif ns.algorithm == "sssp":
                fn = lambda: sharded.sssp(pg, 0, mesh)
            else:
                x = jax.numpy.ones(graph.n_vertices)
                fn = lambda: sharded.spmv(pg, x, mesh)
        out = jax.block_until_ready(fn())  # compile + warm
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ns.iters
        iters_per_run = 20 if ns.algorithm == "pagerank" else 1
        rate = E * iters_per_run / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(
            json.dumps(
                {
                    "algorithm": ns.algorithm,
                    "devices": n,
                    "edges_per_s": round(rate, 0),
                    "speedup": round(rate / base_rate, 2),
                    "efficiency": round(eff, 3),
                    "ms_per_run": round(dt * 1e3, 2),
                    "scheme": ns.scheme,
                    "collective_bytes_per_iter": coll_bytes,
                    "state_bytes_per_device": 4 * pg.v_per_shard,
                }
            )
        )


if __name__ == "__main__":
    main()
