"""Benchmark harness (role of reference benchmarks/ NVBench executables).

One executable per algorithm in the reference (benchmarks/bfs_bench.cu);
here one harness benchmarks any subset on a graph file or a synthetic
suite, with warmup, multiple timed runs, workload-derived MTEPS, and
JSON-lines output (the measurement contract of BASELINE.md).

Usage:
    python benchmarks/run.py --algorithms bfs,sssp,pr --market graph.mtx
    python benchmarks/run.py --algorithms bfs --rmat 18 --edge_factor 16
    python benchmarks/run.py --all --rmat 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from gunrock_tpu.graph import hostcache

ALGORITHMS = [
    "bfs", "sssp", "pr", "bc", "color", "kcore", "tc", "spmv", "hits",
    "mst", "ppr", "geo", "spgemm",
]


def build_graph_from_args(ns):
    if ns.market:
        from gunrock_tpu.io import load_graph_file

        g, _ = load_graph_file(ns.market)
        name = ns.market
    else:
        from gunrock_tpu.io.generators import rmat_graph

        g = rmat_graph(scale=ns.rmat, edge_factor=ns.edge_factor, seed=ns.seed)
        name = f"rmat{ns.rmat}_ef{ns.edge_factor}"
    if ns.reorder == "degree":
        from gunrock_tpu.graph.reorder import degree_sort

        g, _ = degree_sort(g)
        name += "_degsort"
    return g, name


def bench_one(algo: str, graph, ns):
    """Returns (times_ms list, edges_visited, extra dict)."""
    import jax

    from gunrock_tpu import algorithms as A
    from gunrock_tpu.framework.benchmark import (
        dense_workload,
        frontier_workload,
        reached_from_distances,
    )
    from gunrock_tpu.ops.configs import LoadBalance, Options

    if ns.load_balance == "default":
        opt = None  # run() picks the backend-tuned defaults
    else:
        opt = Options(load_balance=LoadBalance.parse(ns.load_balance))
    rng = np.random.default_rng(0)
    deg = np.diff(hostcache.host(graph, "row_offsets"))
    srcs = np.argsort(-deg)[: ns.num_runs].tolist()
    times, edges, extra = [], 0, {}
    # hostcache removed the implicit D2H that left lazy-future mode
    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()

    if algo in ("bfs", "sssp"):
        mod = A.bfs if algo == "bfs" else A.sssp
        res = None
        for s in srcs:
            res = mod.run(graph, int(s), options=opt)
            times.append(res.elapsed_ms)
        stats = frontier_workload(
            graph, reached_from_distances(res.distances), res.search_depth
        )
        edges = stats.edges_visited
        extra["search_depth"] = res.search_depth
    elif algo == "pr":
        for _ in range(ns.num_runs):
            res = A.pr.run(graph, tol=1e-6, options=opt)
            times.append(res.elapsed_ms)
        edges = dense_workload(graph, res.iterations).edges_visited
        extra["iterations"] = res.iterations
    elif algo == "bc":
        for s in srcs:
            res = A.bc.run(graph, int(s), options=opt)
            times.append(res.elapsed_ms)
        edges = 2 * graph.n_edges
    elif algo == "color":
        for i in range(ns.num_runs):
            res = A.color.run(graph, seed=i, options=opt,
                              strategy=ns.color_strategy)
            times.append(res.elapsed_ms)
        edges = graph.n_edges * int(res.iterations)
        extra["colors"] = int(np.asarray(res.colors).max()) + 1
        if ns.color_strategy == "auto":
            # record the strategy "auto" resolved to (mirrors color.run)
            from gunrock_tpu.ops.configs import default_options

            o = opt or default_options()
            pallas = o.load_balance == LoadBalance.PALLAS_MERGE_PATH
            extra["strategy"] = "greedy" if pallas else "luby"
        else:
            extra["strategy"] = ns.color_strategy
    elif algo == "kcore":
        for _ in range(ns.num_runs):
            res = A.kcore.run(graph, options=opt)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
        extra["degeneracy"] = res.degeneracy
        extra["rounds"] = res.rounds
    elif algo == "tc":
        for _ in range(ns.num_runs):
            res = A.tc.run(graph, options=opt)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
        extra["triangles"] = res.n_triangles
    elif algo == "spmv":
        x = rng.random(graph.n_vertices).astype(np.float32)
        for _ in range(ns.num_runs):
            res = A.spmv.run(graph, x, options=opt)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
    elif algo == "hits":
        for _ in range(ns.num_runs):
            res = A.hits.run(graph, max_iterations=20, options=opt)
            times.append(res.elapsed_ms)
        edges = 2 * graph.n_edges * int(res.iterations)
    elif algo == "mst":
        for _ in range(ns.num_runs):
            res = A.mst.run(graph, options=opt)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
        extra["mst_weight"] = res.mst_weight
    elif algo == "ppr":
        for s in srcs:
            res = A.ppr.run(graph, int(s), epsilon=1e-7, options=opt)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
    elif algo == "geo":
        # deterministic 10% labeling, like the example driver's default
        V = graph.n_vertices
        lat = np.full(V, np.nan, np.float32)
        lon = np.full(V, np.nan, np.float32)
        known = rng.choice(V, size=max(1, V // 10), replace=False)
        lat[known] = rng.uniform(-60, 60, known.size).astype(np.float32)
        lon[known] = rng.uniform(-180, 180, known.size).astype(np.float32)
        for _ in range(ns.num_runs):
            res = A.geo.run(graph, lat, lon, total_iterations=3,
                            spatial_iterations=1000, options=opt)
            times.append(res.elapsed_ms)
        edges = 3 * graph.n_edges
    elif algo == "spgemm":
        # count_only: the reference's enact() contract times device work
        # only — materializing C to host over the tunnel is I/O, not SpGEMM
        for _ in range(ns.num_runs):
            res = A.spgemm.run(graph, graph, options=opt, count_only=True)
            times.append(res.elapsed_ms)
        edges = graph.n_edges
        extra["c_nnz"] = res.nnz
    else:
        raise ValueError(algo)
    return times, edges, extra


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algorithms", default="", help="comma-separated subset")
    p.add_argument("--all", action="store_true")
    p.add_argument("-m", "--market", default="")
    p.add_argument("--rmat", type=int, default=16)
    p.add_argument("--edge_factor", type=int, default=16)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("-n", "--num_runs", type=int, default=3)
    p.add_argument("--load_balance", default="default",
                   help="xla_segment | pallas_merge_path | bucketing | default")
    p.add_argument("--reorder", default="none", choices=("none", "degree"),
                   help="hub-first degree-sort relabeling before benching "
                   "(graph/reorder.py)")
    p.add_argument("--color_strategy", default="auto",
                   choices=("auto", "luby", "rank", "greedy"),
                   help="coloring strategy (auto = greedy on Pallas / "
                   "luby on XLA; rank = multi-color rank JP)")
    p.add_argument("--trace", action="store_true",
                   help="capture a jax.profiler trace around the timed "
                   "runs and report MEASURED per-kernel device time + "
                   "gbps_measured next to the cost-model columns "
                   "(utils/trace_stats; role of NVBench HW counters)")
    p.add_argument("--isolate", dest="isolate", action="store_true", default=True,
                   help="one subprocess per algorithm (default)")
    p.add_argument("--no-isolate", dest="isolate", action="store_false")
    ns = p.parse_args(argv)

    algos = ALGORITHMS if ns.all else [a for a in ns.algorithms.split(",") if a]
    if not algos:
        p.error("pass --algorithms or --all")

    if ns.isolate and len(algos) > 1:
        # One subprocess per algorithm: running many Pallas executables in
        # one process can fault the tunneled TPU (observed UNAVAILABLE
        # device errors mid-sweep); isolation keeps each measurement clean.
        import subprocess

        base = [sys.executable, os.path.abspath(__file__), "--no-isolate",
                "-n", str(ns.num_runs), "--load_balance", ns.load_balance,
                "--seed", str(ns.seed), "--reorder", ns.reorder,
                "--color_strategy", ns.color_strategy]
        if ns.trace:
            base += ["--trace"]
        if ns.market:
            base += ["--market", ns.market]
        else:
            base += ["--rmat", str(ns.rmat), "--edge_factor", str(ns.edge_factor)]
        for algo in algos:
            r = subprocess.run(
                base + ["--algorithms", algo], capture_output=True, text=True,
                timeout=1800,
            )
            out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            print("\n".join(out) if out else json.dumps(
                {"algorithm": algo, "error": (r.stderr or "no output")[-200:]}
            ))
            sys.stdout.flush()
        return

    graph, dataset = build_graph_from_args(ns)

    for algo in algos:
        trace_dir = None
        try:
            if ns.trace:
                import tempfile

                from gunrock_tpu.utils import profiler

                trace_dir = tempfile.mkdtemp(prefix=f"gtrace_{algo}_")
                with profiler.trace(trace_dir):
                    times, edges, extra = bench_one(algo, graph, ns)
            else:
                times, edges, extra = bench_one(algo, graph, ns)
        except Exception as e:  # noqa: BLE001 — keep benching other algos
            print(json.dumps({"algorithm": algo, "error": str(e)[:200]}))
            continue
        avg = float(np.mean(times))
        from gunrock_tpu.utils.roofline import roofline

        out = {
            "algorithm": algo,
            "dataset": dataset,
            "num_vertices": graph.n_vertices,
            "num_edges": graph.n_edges,
            "avg_ms": round(avg, 3),
            "min_ms": round(float(np.min(times)), 3),
            "max_ms": round(float(np.max(times)), 3),
            "num_runs": len(times),
            "mteps": round(edges / avg / 1000.0, 2) if avg > 0 else 0.0,
            "load_balance": ns.load_balance,
            # bytes-moved lower bound + % of the measured ~90 GB/s
            # streaming ceiling (the MFU/headroom column — utils/roofline)
            **roofline(algo, graph.n_vertices, graph.n_edges, edges, avg,
                       extra),
            **extra,
        }
        if trace_dir is not None:
            from gunrock_tpu.utils import trace_stats

            model_bytes = out.get("model_mb", 0) * 1e6 * len(times)
            out.update(trace_stats.measured_kernel_table(
                trace_dir, model_bytes or None, top=8
            ))
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
