"""Synthetic dataset writer for the datasets/Makefile targets."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Pure-numpy tool: never touch the tunneled TPU backend (axon registration
# blocks on the tunnel; a down tunnel would hang dataset generation).
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def write_mtx(path, coo, symmetric=False):
    rows, cols, vals = coo.row_indices, coo.col_indices, coo.values
    if symmetric:
        # MatrixMarket symmetric format stores ONE triangle; the loader
        # mirrors it back (matrix_market.py doubling). Generators emit
        # both copies, so keep only row >= col.
        keep = rows >= cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    n = len(rows)
    with open(path, "w") as f:
        sym = "symmetric" if symmetric else "general"
        f.write(f"%%MatrixMarket matrix coordinate real {sym}\n")
        f.write(f"{coo.n_rows} {coo.n_cols} {n}\n")
        np.savetxt(
            f,
            np.column_stack([rows + 1, cols + 1, vals]),
            fmt="%d %d %.6f",
        )
    print(f"wrote {path}: {coo.n_rows} vertices, {n} entries "
          f"({'symmetric' if symmetric else 'general'})")


def main(argv=None):
    from gunrock_tpu.io.generators import (bipartite_coo, delaunay_coo,
                                           grid2d_coo, rmat_coo, sbm_coo,
                                           uniform_random_coo)

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)
    r = sub.add_parser("rmat")
    r.add_argument("--scale", type=int, required=True)
    r.add_argument("--edge-factor", type=int, default=16)
    r.add_argument("--undirected", action="store_true")
    g = sub.add_parser("grid")
    g.add_argument("--side", type=int, required=True)
    u = sub.add_parser("uniform")
    u.add_argument("--n", type=int, required=True)
    u.add_argument("--avg-degree", type=int, default=8)
    d = sub.add_parser("delaunay")
    d.add_argument("--n", type=int, required=True)
    s_ = sub.add_parser("sbm")
    s_.add_argument("--n", type=int, required=True)
    s_.add_argument("--blocks", type=int, default=8)
    s_.add_argument("--avg-degree", type=int, default=16)
    s_.add_argument("--mixing", type=float, default=0.1)
    b = sub.add_parser("bipartite")
    b.add_argument("--left", type=int, required=True)
    b.add_argument("--right", type=int, required=True)
    b.add_argument("--avg-degree", type=int, default=8)
    for s in (r, g, u, d, s_, b):
        s.add_argument("-o", "--output", required=True)
        s.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(argv)

    if ns.kind == "rmat":
        coo = rmat_coo(
            ns.scale, ns.edge_factor, seed=ns.seed, undirected=ns.undirected
        )
        write_mtx(ns.output, coo, symmetric=ns.undirected)
    elif ns.kind == "grid":
        coo = grid2d_coo(ns.side, weighted=True, seed=ns.seed)
        write_mtx(ns.output, coo, symmetric=True)
    elif ns.kind == "delaunay":
        coo = delaunay_coo(ns.n, seed=ns.seed)
        write_mtx(ns.output, coo, symmetric=True)
    elif ns.kind == "sbm":
        coo = sbm_coo(ns.n, ns.blocks, ns.avg_degree, ns.mixing, seed=ns.seed)
        write_mtx(ns.output, coo, symmetric=True)
    elif ns.kind == "bipartite":
        coo = bipartite_coo(ns.left, ns.right, ns.avg_degree, seed=ns.seed)
        write_mtx(ns.output, coo)
    else:
        coo = uniform_random_coo(ns.n, ns.avg_degree, seed=ns.seed)
        write_mtx(ns.output, coo)


if __name__ == "__main__":
    main()
