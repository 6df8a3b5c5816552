"""A/B: coloring strategies on chip — Luby max+min (reference parity)
vs rank-based multi-color JP vs speculative windowed-mex greedy,
each optionally with degree-sort
relabeling. One config per process (axon executable isolation).

Usage: python benchmarks/ab_color_strategy.py [--scale 16]
       [--strategy luby|rank] [--degsort] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--strategy", default="rank", choices=("luby", "rank", "greedy"))
    p.add_argument("--degsort", action="store_true")
    p.add_argument("--runs", type=int, default=3)
    ns = p.parse_args()

    from gunrock_tpu.algorithms import color
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.utils.timer import force_real_execution

    graph = rmat_graph(scale=ns.scale, edge_factor=16, seed=1)
    if ns.degsort:
        from gunrock_tpu.graph.reorder import degree_sort

        graph, _ = degree_sort(graph)

    force_real_execution()
    res = None
    times = []
    for i in range(ns.runs):
        res = color.run(graph, seed=i, strategy=ns.strategy)
        times.append(res.elapsed_ms)
    colors = np.asarray(res.colors)
    print(json.dumps({
        "scale": ns.scale, "strategy": ns.strategy,
        "degsort": bool(ns.degsort),
        "avg_ms": round(float(np.mean(times)), 1),
        "min_ms": round(float(np.min(times)), 1),
        "rounds": int(res.iterations),
        "colors": int(colors.max()) + 1,
    }))


if __name__ == "__main__":
    main()
