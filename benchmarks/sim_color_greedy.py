"""Numpy simulation of speculative greedy (windowed-mex) coloring.

Decides whether the spec-greedy strategy (one plus_times SpMM pass per
round) beats rank-JP (two sparse SpMV passes per round, 57 rounds at s18)
BEFORE any kernel work: round count, color count, and per-round active
window fractions are hardware-independent.

Semantics simulated (exactly what the TPU kernel would compute):
  cnt[v, k]  = # outranking neighbors u of v with color[u] == base + k
  inwin      = colored in [base, base+K)
  conflict   = inwin & cnt[v, color[v]-base] > 0
  mex        = first k with cnt[v, k] == 0  (K if saturated)
  candidates (uncolored | conflicted) take base + mex when mex < K
  stall (no changes) -> base += K; terminate when no uncolored remain.

Priorities are inverse vertex id on a degree-sorted graph (LDF), matching
color_kernel_rank_pallas's static-priority trick.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def rmat_edges_np(scale, edge_factor, seed):
    """Host-side R-MAT matching gunrock_tpu.io.generators semantics
    closely enough for round-count simulation (a=.57,b=.19,c=.19)."""
    rng = np.random.default_rng(seed)
    V = 1 << scale
    E = V * edge_factor
    a, b, c = 0.57, 0.19, 0.19
    src = np.zeros(E, np.int64)
    dst = np.zeros(E, np.int64)
    for bit in range(scale):
        r = rng.random(E)
        s_bit = (r >= a + b).astype(np.int64)
        r2 = rng.random(E)
        d_bit = np.where(
            s_bit == 0, (r2 >= a / (a + b)).astype(np.int64),
            (r2 >= c / (1 - a - b)).astype(np.int64),
        )
        src = (src << 1) | s_bit
        dst = (dst << 1) | d_bit
    keep = src != dst
    return V, src[keep], dst[keep]


def build_csr_sym_degsorted(V, src, dst):
    """Symmetrize, dedup, degree-sort (hubs first), drop self loops.
    Returns (indptr, indices) of the undirected simple graph."""
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    key = u * V + v
    key = np.unique(key)
    u, v = key // V, key % V
    deg = np.bincount(u, minlength=V)
    order = np.argsort(-deg, kind="stable")  # new id 0 = highest degree
    new_id = np.empty(V, np.int64)
    new_id[order] = np.arange(V)
    u, v = new_id[u], new_id[v]
    key = np.sort(u * V + v)
    u, v = key // V, key % V
    indptr = np.zeros(V + 1, np.int64)
    np.add.at(indptr, u + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, v.astype(np.int64)


def simulate(indptr, indices, K, init, max_rounds=100000, window=2048):
    """Run spec-greedy; returns dict of stats. init: 'mex' | 'rank'."""
    V = len(indptr) - 1
    INVALID = -1
    colors = np.full(V, INVALID, np.int64)
    # outranking = neighbor with smaller id (LDF under degsort)
    src = np.repeat(np.arange(V), np.diff(indptr))
    dst = indices
    higher = dst < src  # edge (src <- dst) where dst outranks src
    hsrc, hdst = src[higher], dst[higher]
    rank = np.bincount(hsrc, minlength=V)

    base = 0
    rounds = 0
    passes_full_equiv = 0.0  # sum of active source-window fraction
    nwin = (V + window - 1) // window
    log = []

    if init == "rank":
        colors = np.minimum(rank, K - 1)  # tentative, conflicts repair

    # delta-SpMM model: cnt[V, K] is carried state; each round's pass
    # feeds only the one-hot DELTAS of vertices whose color changed last
    # round (+1 new, -1 old), so source activity tracks the change set.
    prev_changed = np.ones(V, bool)  # round 1 pays the init pass
    while rounds < max_rounds:
        rounds += 1
        inwin = (colors >= base) & (colors < base + K)
        # cnt via bincount over (v, color-base) pairs of outranking edges
        e_act = inwin[hdst]
        pair = hsrc[e_act] * K + (colors[hdst[e_act]] - base)
        cnt = np.bincount(pair, minlength=V * K).reshape(V, K)
        conflict = inwin & (
            cnt[np.arange(V), np.where(inwin, colors - base, 0)] > 0
        )
        cand = (colors == INVALID) | conflict
        free = cnt == 0
        mex = np.where(free.any(axis=1), free.argmax(axis=1), K)
        take = cand & (mex < K)
        new_colors = colors.copy()
        new_colors[conflict] = INVALID
        new_colors[take] = base + mex[take]
        changed_mask = new_colors != colors
        changed = changed_mask.sum()
        # cost model: source windows of the DELTA (changed last round),
        # dest windows with any unstable (uncolored | inwin) vertex
        src_act = np.zeros(nwin, bool)
        if prev_changed.any():
            src_act[np.unique(np.flatnonzero(prev_changed) // window)] = True
        dst_act = np.zeros(nwin, bool)
        dmask = cand | inwin
        if dmask.any():
            dst_act[np.unique(np.flatnonzero(dmask) // window)] = True
        frac = float(src_act.mean() * dst_act.mean())
        passes_full_equiv += frac
        log.append(
            dict(r=rounds, base=base, unc=int((new_colors == INVALID).sum()),
                 conf=int(conflict.sum()), changed=int(changed),
                 srcw=float(src_act.mean()), dstw=float(dst_act.mean()))
        )
        colors = new_colors
        prev_changed = changed_mask
        if changed == 0:
            if (colors == INVALID).sum() == 0:
                break
            base += K
            # phase-init spread: residual (dense-core) vertices seed the
            # new window at rank % K instead of all taking mex=0 together
            unc = colors == INVALID
            colors[unc] = base + rank[unc] % K
            prev_changed = unc.copy()
    # verify properness
    bad = (colors[src] == colors[dst]) & (src != dst)
    assert not bad.any(), f"improper: {bad.sum()} conflicting edges"
    assert (colors >= 0).all()
    return dict(
        rounds=rounds, colors=int(colors.max() + 1),
        distinct=int(len(np.unique(colors))),
        full_pass_equiv=round(passes_full_equiv, 1), log=log,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=14)
    ap.add_argument("--ef", type=int, default=16)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--init", default="both", choices=["mex", "rank", "both"])
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    V, src, dst = rmat_edges_np(args.scale, args.ef, seed=1)
    indptr, indices = build_csr_sym_degsorted(V, src, dst)
    inits = ["mex", "rank"] if args.init == "both" else [args.init]
    for init in inits:
        t0 = time.time()
        r = simulate(indptr, indices, args.K, init)
        log = r.pop("log")
        print(json.dumps(dict(scale=args.scale, K=args.K, init=init,
                              sim_s=round(time.time() - t0, 1), **r)))
        if args.verbose:
            for row in log[:40]:
                print("  ", row)
            if len(log) > 40:
                print(f"   ... {len(log) - 40} more rounds")


if __name__ == "__main__":
    main()
