"""Asynchronous-semantics label-correcting traversal (round 3).

Role of the reference's experimental async runtime
(algorithms/experimental/async/bfs.hxx + container/experimental/async/
queue.hxx:17-356): barrier-free label correcting, where a relaxation may
observe values produced *within the same pass*. The reference gets this
from persistent-kernel MPMC queues (chaotic, nondeterministic order);
XLA has no persistent-kernel analog, so the TPU-native form is
**Gauss-Seidel block sweeps**: vertices are processed in ``n_blocks``
contiguous blocks sequentially inside one compiled sweep, each block's
pull relaxation reading distances ALREADY UPDATED by earlier blocks of
the same sweep. Alternating forward/backward sweep order gives the
classic Bellman-Ford-with-sweeps schedule — deterministic (a fixed
total order replaces the GPU's races) with the same convergence class
as the reference's chaotic relaxation.

Why it matters on TPU: the BSP kernels pay one full pass per *level*,
so a 64x64 grid BFS costs 126 rounds; a forward+backward sweep pair
propagates along monotone paths in ONE pass each way — the sweep count
is bounded by direction reversals on shortest paths, not the diameter
(measured in tests: grid 64x64 converges in <=6 sweeps vs 126 BSP
levels).

Blocks are EDGE-balanced contiguous vertex ranges (fixed vertex blocks
would put a power-law hub's whole in-edge list into one block and
serialize the sweep on it); the whole multi-sweep loop compiles to one
``lax.while_loop`` and per-block reductions are sorted ``segment_min``
over the block's contiguous CSC range.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.graph import Graph, hostcache


def _block_plan(graph: Graph, n_blocks: int):
    """Host-side: edge-balanced contiguous vertex blocks. Returns
    (v_starts int32[n_blocks+1], vb_max, e_starts int32[n_blocks],
    e_max)."""
    V = graph.n_vertices
    E = graph.n_edges
    csc_off = hostcache.host(graph, "csc_offsets")
    targets = (np.arange(1, n_blocks) * (E / n_blocks)).astype(np.int64)
    cuts = np.searchsorted(csc_off, targets, side="left").astype(np.int64)
    v_starts = np.concatenate([[0], cuts, [V]])
    # guarantee monotone boundaries (tiny graphs can produce equal cuts)
    v_starts = np.maximum.accumulate(v_starts)
    vb = np.diff(v_starts)
    vb_max = max(int(vb.max()) if vb.size else 1, 1)
    e_starts = csc_off[v_starts[:-1]].astype(np.int32)
    e_counts = csc_off[v_starts[1:]] - csc_off[v_starts[:-1]]
    e_max = max(int(e_counts.max()) if e_counts.size else 1, 1)
    return (v_starts.astype(np.int32), vb_max, e_starts, e_max)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "vb_max", "e_max", "max_sweeps")
)
def _sweep_kernel(
    csc_rows, csc_vals, csc_dst, v_starts, e_starts, dist0,
    n_blocks: int, vb_max: int, e_max: int, max_sweeps: int,
):
    V = dist0.shape[0]
    E = csc_rows.shape[0]
    # pad so every dynamic_slice is in bounds; padding edge slots carry
    # +inf weights (masked anyway) and dist is padded by vb_max
    pad = jnp.zeros(e_max, jnp.int32)
    rows_p = jnp.concatenate([csc_rows, pad])
    vals_p = jnp.concatenate(
        [csc_vals, jnp.full(e_max, jnp.inf, jnp.float32)]
    )
    dst_p = jnp.concatenate([csc_dst, jnp.full(e_max, 0, jnp.int32)])
    dist_pad = jnp.concatenate([dist0, jnp.full(vb_max, jnp.inf, jnp.float32)])
    eidx = jnp.arange(e_max, dtype=jnp.int32)

    def relax_block(b, dist):
        """Iterate the block's pull relaxation to a local fixed point
        (inner while_loop, early exit): within-block propagation then
        costs O(block diameter) LOCAL passes instead of forcing O(graph
        diameter) GLOBAL sweeps — already-converged blocks pay exactly
        one verification pass. Returns (dist, inner passes)."""
        e0 = e_starts[b]
        v0 = v_starts[b]
        n_v = v_starts[b + 1] - v0
        n_e = jnp.where(
            b + 1 < n_blocks, e_starts[b + 1] - e0, jnp.int32(E) - e0
        )
        src = jax.lax.dynamic_slice(rows_p, (e0,), (e_max,))
        w = jax.lax.dynamic_slice(vals_p, (e0,), (e_max,))
        dst = jax.lax.dynamic_slice(dst_p, (e0,), (e_max,))
        valid = eidx < n_e
        loc = jnp.where(valid, dst - v0, vb_max)
        vmask = jnp.arange(vb_max, dtype=jnp.int32) < n_v

        def inner(c):
            d, _, passes = c
            cand = jnp.where(valid, d[src] + w, jnp.inf)
            relaxed = jax.ops.segment_min(
                cand, loc, num_segments=vb_max + 1,
                indices_are_sorted=True,
            )[:vb_max]
            cur = jax.lax.dynamic_slice(d, (v0,), (vb_max,))
            upd = jnp.where(vmask, jnp.minimum(cur, relaxed), cur)
            changed = jnp.any(upd < cur)
            return (
                jax.lax.dynamic_update_slice(d, upd, (v0,)),
                changed, passes + 1,
            )

        dist, _, passes = jax.lax.while_loop(
            lambda c: c[1], inner, (dist, jnp.bool_(True), jnp.int32(0))
        )
        return dist, passes

    def sweep(c):
        k, dist, _, total = c
        fwd = k % 2 == 0

        def body(i, carry):
            d, tot = carry
            b = jnp.where(fwd, i, n_blocks - 1 - i)
            d, p = relax_block(b, d)
            return d, tot + p

        new, total = jax.lax.fori_loop(0, n_blocks, body, (dist, total))
        changed = jnp.any(new < dist)
        return k + 1, new, changed, total

    def cond(c):
        k, _, changed, _ = c
        return changed & (k < max_sweeps)

    sweeps, dist, _, total = jax.lax.while_loop(
        cond, sweep, (jnp.int32(0), dist_pad, jnp.bool_(True), jnp.int32(0))
    )
    return dist[:V], sweeps, total


def _run(graph, single_source, n_blocks, max_sweeps, unit, ordering):
    V = graph.n_vertices
    n_blocks = max(1, min(n_blocks, V))
    if not (0 <= single_source < V):
        raise ValueError(f"source {single_source} out of range [0, {V})")
    ro = None
    if ordering == "rcm":
        from gunrock_tpu.graph.reorder import rcm_sort
        from gunrock_tpu.ops.pallas.layout import cached_layout

        graph, ro = cached_layout(
            graph.col_indices, lambda: rcm_sort(graph), ("rcm",)
        )
        single_source = int(ro.rank[single_source])
    elif ordering != "natural":
        raise ValueError(f"unknown ordering {ordering!r}")
    values = jnp.ones_like(graph.csc_values) if unit else graph.csc_values
    v_starts, vb_max, e_starts, e_max = _block_plan(graph, n_blocks)
    dist0 = jnp.full(V, jnp.inf, jnp.float32).at[single_source].set(0.0)
    max_sweeps = 2 * V if max_sweeps is None else max_sweeps
    dist, sweeps, passes = _sweep_kernel(
        graph.csc_rows, values, graph.csc_dst,
        jnp.asarray(v_starts), jnp.asarray(e_starts), dist0,
        n_blocks=n_blocks, vb_max=vb_max, e_max=e_max,
        max_sweeps=max_sweeps,
    )
    if ro is not None:
        dist = dist[jnp.asarray(ro.rank)]  # back to input vertex ids
    return dist, sweeps, passes


def sssp_async(
    graph: Graph,
    single_source: int,
    n_blocks: int = 32,
    max_sweeps: int | None = None,
    ordering: str = "natural",
):
    """Label-correcting SSSP with Gauss-Seidel block sweeps. Returns
    (distances f32[V], sweeps, block_passes): a sweep visits every block
    once (forward or backward order); ``block_passes`` counts inner
    block relaxations — the total-work metric comparable to the BSP
    kernels' level count (each block pass touches ~E/n_blocks edges, so
    edge-relaxation work ~= block_passes/n_blocks full passes).
    ``ordering="rcm"`` relabels (cached per graph) so shortest paths are
    near-monotone in id space — the sweep schedule's best case."""
    dist, sweeps, passes = _run(graph, single_source, n_blocks,
                                max_sweeps, False, ordering)
    return dist, int(sweeps), int(passes)


def bfs_async(
    graph: Graph,
    single_source: int,
    n_blocks: int = 32,
    max_sweeps: int | None = None,
    ordering: str = "natural",
):
    """Label-correcting BFS (unit weights through the same sweeps).
    Returns (depth int32[V], sweeps, block_passes); unreached = int32
    max."""
    dist, sweeps, passes = _run(graph, single_source, n_blocks,
                                max_sweeps, True, ordering)
    depth = jnp.where(
        jnp.isinf(dist), jnp.int32(np.iinfo(np.int32).max),
        dist.astype(jnp.int32),
    )
    return depth, int(sweeps), int(passes)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "vb_max", "e_max", "max_sweeps")
)
def _pr_gs_kernel(
    csc_rows, csc_vals, csc_dst, v_starts, e_starts, iweights, dangling,
    p0, n_blocks: int, vb_max: int, e_max: int, max_sweeps: int,
    alpha: float, tol: float,
):
    """Gauss-Seidel PageRank sweeps: block b's ranks update from ranks
    ALREADY refreshed by earlier blocks of the same sweep (the classic
    ~2x iteration cut over Jacobi power iteration — same unique fixed
    point). The dangling-mass term is maintained incrementally."""
    V = p0.shape[0]
    E = csc_rows.shape[0]
    pad = jnp.zeros(e_max, jnp.int32)
    rows_p = jnp.concatenate([csc_rows, pad])
    vals_p = jnp.concatenate([csc_vals, jnp.zeros(e_max, jnp.float32)])
    dst_p = jnp.concatenate([csc_dst, jnp.full(e_max, 0, jnp.int32)])
    p_pad = jnp.concatenate([p0, jnp.zeros(vb_max, jnp.float32)])
    dang_pad = jnp.concatenate([dangling, jnp.zeros(vb_max, jnp.bool_)])
    iw_pad = jnp.concatenate([iweights, jnp.zeros(vb_max, jnp.float32)])
    eidx = jnp.arange(e_max, dtype=jnp.int32)
    dsum0 = jnp.sum(jnp.where(dang_pad, alpha * p_pad, 0.0))

    def relax_block(b, carry):
        p, dsum, err = carry
        e0 = e_starts[b]
        v0 = v_starts[b]
        n_v = v_starts[b + 1] - v0
        n_e = jnp.where(
            b + 1 < n_blocks, e_starts[b + 1] - e0, jnp.int32(E) - e0
        )
        src = jax.lax.dynamic_slice(rows_p, (e0,), (e_max,))
        w = jax.lax.dynamic_slice(vals_p, (e0,), (e_max,))
        dst = jax.lax.dynamic_slice(dst_p, (e0,), (e_max,))
        valid = eidx < n_e
        contrib = jnp.where(valid, p[src] * iw_pad[src] * w, 0.0)
        loc = jnp.where(valid, dst - v0, vb_max)
        summed = jax.ops.segment_sum(
            contrib, loc, num_segments=vb_max + 1, indices_are_sorted=True
        )[:vb_max]
        base = (1.0 - alpha + dsum) / V
        vmask = jnp.arange(vb_max, dtype=jnp.int32) < n_v
        cur = jax.lax.dynamic_slice(p, (v0,), (vb_max,))
        new = jnp.where(vmask, base + summed, cur)
        # incremental dangling-mass update for this block's delta
        dmask = jax.lax.dynamic_slice(dang_pad, (v0,), (vb_max,))
        dsum = dsum + alpha * jnp.sum(jnp.where(dmask, new - cur, 0.0))
        err = jnp.maximum(err, jnp.max(jnp.abs(new - cur)))
        return jax.lax.dynamic_update_slice(p, new, (v0,)), dsum, err

    def sweep(c):
        k, p, dsum, _ = c
        fwd = k % 2 == 0

        def body(i, carry):
            b = jnp.where(fwd, i, n_blocks - 1 - i)
            return relax_block(b, carry)

        p, dsum, err = jax.lax.fori_loop(
            0, n_blocks, body, (p, dsum, jnp.float32(0.0))
        )
        return k + 1, p, dsum, err

    def cond(c):
        k, _, _, err = c
        return (err >= tol) & (k < max_sweeps)

    sweeps, p, _, _ = jax.lax.while_loop(
        cond, sweep, (jnp.int32(0), p_pad, dsum0, jnp.float32(jnp.inf))
    )
    return p[:V], sweeps


def pr_async(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    n_blocks: int = 32,
    max_sweeps: int = 10_000,
):
    """Gauss-Seidel PageRank (async-semantics sweeps). Returns
    (p f32[V], sweeps) — the same fixed point as algorithms/pr.run in
    measurably fewer passes over E (freshness within a sweep)."""
    from gunrock_tpu.algorithms.pr import compute_iweights

    V = graph.n_vertices
    n_blocks = max(1, min(n_blocks, V))
    v_starts, vb_max, e_starts, e_max = _block_plan(graph, n_blocks)
    # 1/out_wsum per vertex; alpha is folded into the edge weights below
    iweights = compute_iweights(graph, 1.0)
    dangling = iweights == 0.0
    p0 = jnp.full(V, 1.0 / V, jnp.float32)
    p, sweeps = _pr_gs_kernel(
        graph.csc_rows, graph.csc_values * jnp.float32(alpha),
        graph.csc_dst,
        jnp.asarray(v_starts), jnp.asarray(e_starts), iweights, dangling,
        p0, n_blocks=n_blocks, vb_max=vb_max, e_max=e_max,
        max_sweeps=max_sweeps, alpha=alpha, tol=tol,
    )
    return p, int(sweeps)
