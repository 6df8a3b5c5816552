"""North-star benchmark suite: BASELINE.json's six dataset configs,
measured on real or CLASS-PROXY graphs at honest scale.

The environment has zero egress (datasets/fetch.py records 0/5
reachable), so every SuiteSparse config except the vendored chesapeake
runs on a structural proxy of the same graph class at matched size
(VERDICT r4 next-step #5 prescription):

  chesapeake   real chesapeake.mtx (vendored)            -> BFS
  road         delaunay n=2^21 (delaunay_n21 class;      -> SSSP, PR
               roadNet-CA: V=1.97M planar high-diameter)
  coauthor     SBM n=299,067, 300 blocks, avg deg 13     -> BC, color
               (coAuthorsDBLP: V=299,067 community)
  web          R-MAT s20 ef3 directed (webbase-1M:       -> SpMV, SpGEMM
               V=1M, E=3.1M power-law)
  social       R-MAT s22 ef16 (soc-LiveJournal1:         -> TC, k-core,
               V=4.8M, E=69M power-law social)              HITS

Usage: python benchmarks/north_star.py <config> <algo>
       python benchmarks/north_star.py --all   # subprocess per pair
Appends one JSON line per run to benchmarks/results_north_star.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

OUT = os.path.join(HERE, "results_north_star.jsonl")

CONFIGS = {
    "chesapeake": ["bfs"],
    "road": ["sssp", "pr"],
    "coauthor": ["bc", "color"],
    "web": ["spmv", "spgemm"],
    "social": ["tc", "kcore", "hits"],
}


def build_graph(config: str):
    from gunrock_tpu.graph.reorder import degree_sort
    from gunrock_tpu.io import generators as G

    if config == "chesapeake":
        from gunrock_tpu.io import load_graph_file

        g, _ = load_graph_file(
            os.path.join(HERE, "..", "datasets", "chesapeake.mtx")
        )
        return g, "chesapeake.mtx (real)", None
    if config == "road":
        from gunrock_tpu.graph.reorder import rcm_sort

        # RCM, not degree sort: planar meshes have uniform degrees but
        # terrible bucket locality under random labeling (delaunay n20
        # measured 262K chunks at W=2048 — 10x fragmentation, past the
        # SMEM budget into the paged path); bandwidth-minimizing RCM is
        # the road-class analog of the power-law degree sort.
        g = G.delaunay_graph(1 << 21, seed=1)
        g, perm = rcm_sort(g)
        return g, "delaunay_n21 proxy (roadNet-CA class, RCM)", perm
    if config == "coauthor":
        g = G.sbm_graph(299_067, n_blocks=300, avg_degree=13, seed=1)
        g, perm = degree_sort(g)
        return g, "sbm-300k proxy (coAuthorsDBLP class)", perm
    if config == "web":
        g = G.rmat_graph(scale=20, edge_factor=3, seed=1)
        g, perm = degree_sort(g)
        return g, "rmat20-ef3 proxy (webbase-1M class)", perm
    if config == "social":
        g = G.rmat_graph(scale=22, edge_factor=16, seed=1,
                         undirected=True)
        g, perm = degree_sort(g)
        return g, "rmat22-ef16 proxy (soc-LiveJournal1 class)", perm
    raise KeyError(config)


def run_one(config: str, algo: str, num_runs: int = 1):
    import numpy as np

    from gunrock_tpu import algorithms as A
    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    t0 = time.perf_counter()
    g, label, _ = build_graph(config)
    build_s = time.perf_counter() - t0
    rec = {
        "config": config, "algorithm": algo, "dataset": label,
        "n_vertices": int(g.n_vertices), "n_edges": int(g.n_edges),
        "build_s": round(build_s, 1),
    }
    times, extra = [], {}
    for i in range(num_runs):
        if algo == "bfs":
            r = A.bfs.run(g, 0)
            d = np.asarray(r.distances)
            extra["depth"] = int(d[d < np.iinfo(np.int32).max].max())
            extra["mteps"] = round(g.n_edges / r.elapsed_ms / 1e3, 2)
        elif algo == "sssp":
            if config == "road":
                # high-diameter planar class: BSP SSSP is thousands of
                # rounds — ONE while_loop dispatch exceeds the axon RPC
                # deadline (UNAVAILABLE; geo's round-3 failure class).
                # Use the round-slabbed resumable DO driver (sssp.py).
                import jax as _jax

                from gunrock_tpu.algorithms.sssp import sssp_do_slabbed
                from gunrock_tpu.ops.pallas.semiring import (
                    _BIG, pull_layout)

                lay = pull_layout(g, pad_value=_BIG)
                _jax.block_until_ready(
                    sssp_do_slabbed(
                        g, 0, rounds_per_dispatch=100, layout=lay
                    )[0]
                )
                t0_ = time.perf_counter()
                d, depth = sssp_do_slabbed(
                    g, 0, rounds_per_dispatch=100, layout=lay
                )
                _jax.block_until_ready(d)
                ms = (time.perf_counter() - t0_) * 1e3
                extra["depth"] = int(depth)
                extra["mode"] = "do_slabbed_100_pallas"

                class R:  # noqa: N801 — local result shim
                    elapsed_ms = ms

                r = R()
            else:
                r = A.sssp.run(g, 0)
            extra["mteps"] = round(g.n_edges / r.elapsed_ms / 1e3, 2)
        elif algo == "pr":
            r = A.pr.run(g)
            extra["iterations"] = int(r.iterations)
        elif algo == "bc":
            r = A.bc.run(g, 0)
        elif algo == "color":
            r = A.color.run(g, seed=i)
            extra["colors"] = int(np.asarray(r.colors).max()) + 1
        elif algo == "spmv":
            rng = np.random.default_rng(0)
            x = rng.random(g.n_vertices).astype(np.float32)
            r = A.spmv.run(g, x)
        elif algo == "spgemm":
            r = A.spgemm.run(g, g, count_only=True)
            extra["nnz"] = int(r.nnz)
        elif algo == "tc":
            r = A.tc.run(g)
            extra["triangles"] = int(r.n_triangles)
        elif algo == "kcore":
            r = A.kcore.run(g)
            extra["degeneracy"] = int(r.degeneracy)
            extra["rounds"] = int(r.rounds)
        elif algo == "hits":
            r = A.hits.run(g, max_iterations=20)
        else:
            raise KeyError(algo)
        times.append(r.elapsed_ms)
    rec.update(avg_ms=round(sum(times) / len(times), 1),
               min_ms=round(min(times), 1), num_runs=num_runs, **extra)
    print(json.dumps(rec))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", choices=list(CONFIGS))
    ap.add_argument("algo", nargs="?")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("-n", "--num_runs", type=int, default=1)
    ns = ap.parse_args(argv)
    if ns.all:
        for cfg, algos in CONFIGS.items():
            for algo in algos:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), cfg,
                     algo, "-n", str(ns.num_runs)],
                    timeout=3600,
                )
                if r.returncode:
                    print(f"FAIL {cfg}/{algo} rc={r.returncode}")
        return
    if not ns.config or not ns.algo:
        ap.error("pass <config> <algo> or --all")
    run_one(ns.config, ns.algo, ns.num_runs)


if __name__ == "__main__":
    main()
