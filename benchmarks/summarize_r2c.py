"""Summarize benchmarks/results_r2c.jsonl into a compact table grouped
by experiment, for the post-battery decision tree (CLAUDE.md).

Usage: python benchmarks/summarize_r2c.py [path]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results_r2c.jsonl"
    groups = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            key = (
                row.get("metric")
                or (row["ab"] + ":" + row.get("variant", "")
                    if "ab" in row else None)
                or row.get("probe")
                or row.get("algo")
                or row.get("algorithm")
                or ("color:" + row["strategy"] if "strategy" in row else None)
                or ("smoke:" + row["kernel"] if "kernel" in row else None)
                or "other"
            )
            groups[key].append(row)
    for key in sorted(groups):
        print(f"== {key}")
        for row in groups[key]:
            slim = {
                k: v for k, v in row.items()
                if k not in ("metric", "probe", "algo", "algorithm")
            }
            print("  ", json.dumps(slim))


if __name__ == "__main__":
    main()
