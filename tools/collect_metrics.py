"""Merge performance JSONs: outlier filtering + MTEPS recomputation.

Role of reference examples/algorithms/collect_metrics.py:1-60 — the
reference needs it to merge a metrics build's workload counts with a
clean build's runtimes; here one build yields both, so this tool merges
*multiple runs* of the same (primitive, dataset) pair: 2-sigma outlier
filtering over process times, recomputed MTEPS, one summary JSON.

Usage:
    python tools/collect_metrics.py out/*.json -o summary.json
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def filter_outliers(times: list[float], n_sigma: float = 2.0) -> list[float]:
    """Drop entries more than ~n_sigma sigmas from the center (the
    reference's 2-sigma filter role). Uses the median/MAD robust estimate:
    a plain mean/std test can never reject anything from n <= 5 samples
    (max deviation is bounded by sigma*sqrt(n-1)), which is exactly the
    --num_runs regime this tool merges."""
    a = np.asarray(times, dtype=float)
    if a.size < 3:
        return list(a)
    med = np.median(a)
    mad = np.median(np.abs(a - med))
    sigma = 1.4826 * mad if mad > 0 else (a.std() or 1.0)
    keep = np.abs(a - med) <= n_sigma * sigma
    return list(a[keep])


def merge(paths: list[str]) -> list[dict]:
    groups: dict[tuple, list[dict]] = defaultdict(list)
    for p in paths:
        data = json.loads(Path(p).read_text())
        groups[(data.get("primitive"), data.get("graph_file"))].append(data)

    out = []
    for (primitive, graph_file), runs in sorted(groups.items()):
        times = [t for r in runs for t in r.get("process_times", [])]
        times = filter_outliers(times)
        edges_visited = max(r.get("edges_visited", 0) for r in runs)
        avg = float(np.mean(times)) if times else 0.0
        out.append(
            {
                "primitive": primitive,
                "graph_file": graph_file,
                "num_runs_merged": len(runs),
                "num_times": len(times),
                "avg_process_time": avg,
                "stddev_process_time": float(np.std(times)) if times else 0.0,
                "min_process_time": float(np.min(times)) if times else 0.0,
                "max_process_time": float(np.max(times)) if times else 0.0,
                "edges_visited": edges_visited,
                "avg_mteps": edges_visited / avg / 1000.0 if avg > 0 else 0.0,
            }
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("jsons", nargs="+")
    p.add_argument("-o", "--output", default="")
    ns = p.parse_args(argv)
    merged = merge(ns.jsons)
    text = json.dumps(merged, indent=2)
    if ns.output:
        Path(ns.output).write_text(text)
        print(f"wrote {ns.output} ({len(merged)} groups)")
    else:
        print(text)


if __name__ == "__main__":
    main()
