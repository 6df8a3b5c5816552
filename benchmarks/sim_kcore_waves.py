"""Numpy k-core peel simulation: wave count + per-wave source/dest window
activity under degree-sorted labeling — predicts which tail grid
(n_chunks, /8, /64) each round's decrement pass selects, hence the
expected win of semiring._tail_grid_dispatch before the chip measures.

Mirrors algorithms/kcore.py's flat loop (k-jump + cond-guarded pass).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from sim_color_greedy import build_csr_sym_degsorted, rmat_edges_np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--ef", type=int, default=16)
    ap.add_argument("--window", type=int, default=2048)
    args = ap.parse_args()
    V, src, dst = rmat_edges_np(args.scale, args.ef, seed=1)
    indptr, indices = build_csr_sym_degsorted(V, src, dst)
    esrc = np.repeat(np.arange(V), np.diff(indptr))
    W = args.window
    nwin = (V + W - 1) // W

    deg = np.diff(indptr).astype(np.int64)
    deleted = np.zeros(V, bool)
    k = 1
    waves = 0
    jumps = 0
    # per-round grid tiers selected (chunk activity ~ src windows with a
    # peeled vertex x dst windows with an alive vertex; proxy: product)
    tiers = {"full": 0, "8": 0, "64": 0}
    pass_equiv = 0.0
    while not deleted.all():
        peel = ~deleted & (deg <= k)
        if not peel.any():
            k = max(k + 1, deg[~deleted].min())
            jumps += 1
            continue
        waves += 1
        deleted |= peel
        dec = np.bincount(indices[peel[esrc]], minlength=V)
        deg = deg - dec
        srcw = len(np.unique(np.flatnonzero(peel) // W)) / nwin
        alive = ~deleted
        dstw = (
            len(np.unique(np.flatnonzero(alive) // W)) / nwin
            if alive.any() else 0.0
        )
        frac = srcw * dstw
        pass_equiv += frac
        tier = "full" if frac > 1 / 8 else ("8" if frac > 1 / 64 else "64")
        tiers[tier] += 1
    print(json.dumps(dict(
        scale=args.scale, degeneracy=int(k), waves=waves, kjumps=jumps,
        pass_equiv=round(pass_equiv, 1), tiers=tiers,
    )))


if __name__ == "__main__":
    main()
