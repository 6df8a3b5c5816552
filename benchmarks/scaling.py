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


def partition_stats(graph, n):
    """Host-side (numpy, no devices) halo statistics of the vertex-
    sharded partition for n chips: what parallel/sharded.py's
    _halo_tables computes, minus the routing tables. Lets the analytical
    model sweep n far beyond the devices present."""
    import numpy as np

    V = graph.n_vertices
    Vs = -(-max(V, 1) // n)
    src = np.asarray(graph.edge_src).astype(np.int64)
    dst = np.asarray(graph.col_indices).astype(np.int64)
    H = 1
    tot_boundary = 0
    for d in range(n):
        m = dst // Vs == d  # dst-grouped edges owned by d
        uniq = np.unique(src[m])
        own = uniq // Vs
        counts = np.bincount(own, minlength=n)
        counts[d] = 0  # local reads are not boundary traffic
        tot_boundary += int(counts.sum())
        if counts.size:
            H = max(H, int(counts.max()))
    return {"v_per_shard": Vs, "halo_max_pair": H,
            "boundary_vertices_total": tot_boundary}


def model_efficiency(graph, sizes, stream_gbps=90.0, ici_gbps=100.0,
                     ici_lat_us=5.0, exchanges_per_iter=1,
                     pass_ms: float = 0.0, chips_per_host: int = 0,
                     dcn_gbps: float = 25.0, dcn_lat_us: float = 50.0):
    """Analytical scaling-efficiency prediction (the BASELINE >=70%
    edges/s north-star, computable without a pod slice): per iteration,
    T_comp(n) = (E/n * 12 B) / stream; comm is one boundary exchange —
    all_gather moves (n-1)/n * V * 4 B through each chip's ICI in n-1
    ring hops, the halo all_to_all moves n * H * 4 B in one hop.
    eff(n) = T1 / (n * Tn). Parameters are explicit because this chip is
    a single tunneled v5lite with no ICI to measure: stream_gbps is the
    measured HBM ceiling, ici_gbps/lat are nominal-class numbers to be
    replaced by pod measurements (scaling.py without --model)."""
    E = graph.n_edges
    V = graph.n_vertices
    # pass_ms: the MEASURED single-chip dense pass (BASELINE round-4:
    # 13.2 ms at s18 degsort) — the raw-stream idealization understates
    # T_comp ~15x, which overstates the comm share and understates
    # efficiency; prefer the measurement when available
    t1 = (pass_ms * 1e-3) if pass_ms else E * 12 / (stream_gbps * 1e9)
    rows = []
    for n in sizes:
        st = partition_stats(graph, n)
        t_comp = t1 / n
        ag_bytes = (n - 1) / n * V * 4
        halo_bytes = n * st["halo_max_pair"] * 4
        t_ag = ag_bytes / (ici_gbps * 1e9) + (n - 1) * ici_lat_us * 1e-6
        t_halo = halo_bytes / (ici_gbps * 1e9) + ici_lat_us * 1e-6
        use_halo = st["halo_max_pair"] < st["v_per_shard"]
        row_extra = {}
        if chips_per_host and n > chips_per_host:
            # hierarchical (host, chip) mesh: the 2-stage exchange's DCN
            # stage carries per-host AGGREGATED blocks (one message per
            # host pair, parallel/sharded._a2a_shards); ICI carries the
            # in-host reroute. The slower tier gates the exchange.
            n_hosts = -(-n // chips_per_host)
            H = st["halo_max_pair"]
            dcn_halo = (n - chips_per_host) * H * 4
            dcn_ag = (n_hosts - 1) * chips_per_host * st["v_per_shard"] * 4
            t_halo = max(
                t_halo,
                dcn_halo / (dcn_gbps * 1e9)
                + (n_hosts - 1) * dcn_lat_us * 1e-6,
            )
            t_ag = max(
                t_ag,
                dcn_ag / (dcn_gbps * 1e9)
                + (n_hosts - 1) * dcn_lat_us * 1e-6,
            )
            row_extra = {
                "n_hosts": n_hosts,
                "dcn_bytes": int(dcn_halo if use_halo else dcn_ag),
                "ici_bytes": int(
                    (halo_bytes if use_halo else ag_bytes)
                    - (dcn_halo if use_halo else 0)
                ),
                "dcn_gbps": dcn_gbps,
            }
        t_comm = (min(t_ag, t_halo) if use_halo else t_ag) * exchanges_per_iter
        tn = t_comp + t_comm
        rows.append({
            "devices": n,
            "predicted_efficiency": round(t1 / (n * tn), 3),
            "t_comp_us": round(t_comp * 1e6, 1),
            "t_comm_us": round(t_comm * 1e6, 1),
            "exchange_mode": "halo" if (use_halo and t_halo < t_ag) else "all_gather",
            "halo_max_pair": st["halo_max_pair"],
            "v_per_shard": st["v_per_shard"],
            "stream_gbps": stream_gbps,
            "ici_gbps": ici_gbps,
            **row_extra,
        })
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", type=int, default=0,
                   help="force a virtual CPU mesh with this many devices")
    p.add_argument("--model", action="store_true",
                   help="emit the ANALYTICAL efficiency prediction "
                   "(bytes x bandwidth, no devices needed) for n up to "
                   "--model-max")
    p.add_argument("--model-max", type=int, default=64)
    p.add_argument("--ici-gbps", type=float, default=100.0,
                   help="assumed per-chip ICI bandwidth (model mode)")
    p.add_argument("--stream-gbps", type=float, default=90.0,
                   help="measured per-chip HBM streaming rate")
    p.add_argument("--pass-ms", type=float, default=0.0,
                   help="MEASURED single-chip dense pass time for this "
                   "graph (e.g. 13.2 at s18 degsort, v5 kernel — "
                   "BASELINE round-4). When given, T_comp derives from "
                   "it instead of the raw-stream idealization, so "
                   "efficiency numbers reflect the real kernel "
                   "(VERDICT round-3 next-step #3)")
    p.add_argument("--ici-lat-us", type=float, default=5.0)
    p.add_argument("--chips-per-host", type=int, default=0,
                   help="model a hierarchical (host, chip) mesh: shards "
                   "beyond this count cross DCN; the 2-stage exchange "
                   "(sharded._a2a_shards) aggregates per-host blocks so "
                   "DCN sees one message per host pair")
    p.add_argument("--dcn-gbps", type=float, default=25.0,
                   help="assumed per-host DCN bandwidth (model mode)")
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

    if ns.model:
        sizes = [n for n in (2, 4, 8, 16, 32, 64) if n <= ns.model_max]
        for row in model_efficiency(graph, sizes,
                                    stream_gbps=ns.stream_gbps,
                                    ici_gbps=ns.ici_gbps,
                                    ici_lat_us=ns.ici_lat_us,
                                    pass_ms=ns.pass_ms,
                                    chips_per_host=ns.chips_per_host,
                                    dcn_gbps=ns.dcn_gbps):
            print(json.dumps({"rmat": ns.rmat, **row}))
        return

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
