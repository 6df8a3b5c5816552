"""Point-set generator tool.

Role of reference examples/tools/nearest_neighbor.cu + io/points.hxx: the
star-shaped point-set generator for nearest-neighbor experiments. Here:
star sets on a grid (the reference's 5-point stars at random centers,
deduplicated) or uniform random 2-D points, written one `x y` pair per
line.

Usage:
    python tools/points.py stars --dim 100 100 -n 50 -o points.txt
    python tools/points.py uniform -n 1000 -o points.txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def generate_stars(dim1: int, dim2: int, n: int, seed: int = 0) -> np.ndarray:
    """n 5-point stars (center + left/right/up/down) at random grid
    centers, deduplicated (reference io/points.hxx ``generate``)."""
    rng = np.random.default_rng(seed)
    cx = rng.integers(1, max(dim1 - 1, 2), n)
    cy = rng.integers(1, max(dim2 - 1, 2), n)
    offsets = np.array([[0, 0], [-1, 0], [1, 0], [0, 1], [0, -1]])
    pts = (np.stack([cx, cy], axis=1)[:, None, :] + offsets[None, :, :]).reshape(-1, 2)
    pts = pts[(pts[:, 0] >= 0) & (pts[:, 0] < dim1) & (pts[:, 1] >= 0) & (pts[:, 1] < dim2)]
    return np.unique(pts, axis=0)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)
    s = sub.add_parser("stars")
    s.add_argument("--dim", type=int, nargs=2, default=[100, 100])
    u = sub.add_parser("uniform")
    for sp in (s, u):
        sp.add_argument("-n", type=int, required=True)
        sp.add_argument("-o", "--output", default="")
        sp.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(argv)

    if ns.kind == "stars":
        pts = generate_stars(ns.dim[0], ns.dim[1], ns.n, ns.seed)
    else:
        from gunrock_tpu.io.generators import generate_points

        pts = generate_points(ns.n, seed=ns.seed)
    out = "\n".join(f"{x} {y}" for x, y in pts.tolist())
    if ns.output:
        with open(ns.output, "w") as f:
            f.write(out + "\n")
        print(f"wrote {len(pts)} points to {ns.output}")
    else:
        print(out)


if __name__ == "__main__":
    main()
