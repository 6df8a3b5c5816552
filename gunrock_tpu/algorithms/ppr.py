"""Personalized PageRank from a seed (Andersen-style push), plus batch.

Role of reference include/gunrock/algorithms/ppr.hxx:

- reset: ``p = 0``, ``r = r' = indicator(seed)`` (ppr.hxx:68-86),
- per iteration: filter over the frontier — ``p[v] += 2a/(1+a) * r[v]``,
  ``r'[v] = 0`` (ppr.hxx:124-130); advance over frontier out-edges —
  ``r'[dst] += (1-a)/(1+a) * r[src]/deg(src)``, with ``dst`` entering the
  output frontier exactly when the accumulation crosses the threshold
  ``deg(dst) * eps`` (ppr.hxx:132-143); then ``r <- r'``,
- batch over many seeds (ppr.hxx:217-238).

TPU redesign: the per-edge atomic threshold-crossing race collapses into a
deterministic dense form — per-destination update sums are one cumsum
difference in CSC order, and the crossing test compares before/after
totals (the net effect of the reference's atomics). Batch = vmap.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import hostcache

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Param:
    seed: int
    alpha: float = 0.15
    epsilon: float = 1e-6


@dataclasses.dataclass
class Result:
    p: jax.Array  # float32[V]
    iterations: int
    elapsed_ms: float


def ppr_kernel(
    graph: Graph,
    seed,
    alpha: float = 0.15,
    epsilon: float = 1e-6,
    max_iterations: int | None = None,
):
    """Pure PPR. Returns (p f32[V], iterations)."""
    V = graph.n_vertices
    max_it = (2 * V) if max_iterations is None else max_iterations
    _2a1a = (2 * alpha) / (1 + alpha)
    _1a1a = (1 - alpha) / (1 + alpha)
    deg = jnp.diff(graph.row_offsets).astype(jnp.float32)

    p0 = jnp.zeros(V, jnp.float32)
    r0 = jnp.zeros(V, jnp.float32).at[seed].set(1.0)
    front0 = jnp.zeros(V, bool).at[seed].set(True)

    def cond(c):
        it, front, p, r, rp = c
        return jnp.any(front) & (it < max_it)

    def body(c):
        it, front, p, r, rp = c
        # filter: absorb 2a/(1+a) of residual, reset r' on the frontier
        p = jnp.where(front, p + _2a1a * r, p)
        rp = jnp.where(front, 0.0, rp)
        # advance: push (1-a)/(1+a) * r/deg along frontier out-edges
        src = graph.csc_rows
        push = jnp.where(
            front[src], _1a1a * r[src] / jnp.maximum(deg[src], 1.0), 0.0
        )
        ce = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(push)])
        upd = ce[graph.csc_offsets[1:]] - ce[graph.csc_offsets[:-1]]
        # threshold uses the destination's degree (reference uses the CSR
        # out-degree at dst, ppr.hxx:140-141)
        thresh = deg * epsilon
        new_rp = rp + upd
        new_front = (rp < thresh) & (new_rp >= thresh)
        r = new_rp
        return it + 1, new_front, p, r, new_rp

    it, _, p, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), front0, p0, r0, r0)
    )
    return p, it


def ppr_kernel_pallas(
    graph: Graph,
    seed,
    layout,
    alpha: float = 0.15,
    epsilon: float = 1e-6,
    max_iterations: int | None = None,
    interpret: bool = False,
):
    """PPR with the frontier-sparse semiring advance: the per-wave
    residual push is ONE chunk-skipping plus_times pass whose cost tracks
    the (typically tiny) frontier's window spread instead of O(E) — the
    XLA path pays a full E-sized gather + cumsum every wave. Same
    update rules as ppr_kernel. Returns (p f32[V], iterations)."""
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv_sparse

    V = graph.n_vertices
    max_it = (2 * V) if max_iterations is None else max_iterations
    _2a1a = (2 * alpha) / (1 + alpha)
    _1a1a = (1 - alpha) / (1 + alpha)
    deg = jnp.diff(graph.row_offsets).astype(jnp.float32)

    p0 = jnp.zeros(V, jnp.float32)
    r0 = jnp.zeros(V, jnp.float32).at[seed].set(1.0)
    front0 = jnp.zeros(V, bool).at[seed].set(True)

    def cond(c):
        it, front, p, r, rp = c
        return jnp.any(front) & (it < max_it)

    def body(c):
        it, front, p, r, rp = c
        p = jnp.where(front, p + _2a1a * r, p)
        rp = jnp.where(front, 0.0, rp)
        x = jnp.where(front, _1a1a * r / jnp.maximum(deg, 1.0), 0.0)
        upd = bucketed_semiring_spmv_sparse(
            layout, x, front, "plus_times", interpret=interpret,
            tail_grids=(2, 4, 8, 64),
        )
        thresh = deg * epsilon
        new_rp = rp + upd
        new_front = (rp < thresh) & (new_rp >= thresh)
        return it + 1, new_front, p, new_rp, new_rp

    it, _, p, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), front0, p0, r0, r0)
    )
    return p, it


def run(
    graph: Graph,
    seed: int,
    alpha: float = 0.15,
    epsilon: float = 1e-6,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``ppr::run`` (ppr.hxx:170-195). Options route
    the strategy: frontier-sparse Pallas push on TPU (default_options),
    the XLA cumsum-difference path otherwise."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH and graph.n_edges:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.semiring import pull_layout
        from gunrock_tpu.utils.jitcache import cached_jit

        interpret = use_interpret()
        layout = pull_layout(graph, unit=True, interpret=interpret)
        fn = cached_jit(
            ("ppr_pallas", alpha, epsilon, interpret),
            lambda: lambda g, s, lay: ppr_kernel_pallas(
                g, s, lay, alpha, epsilon, interpret=interpret
            ),
        )
        args = (graph, seed, layout)
    else:
        from gunrock_tpu.utils.jitcache import cached_jit

        fn = cached_jit(
            ("ppr_xla", alpha, epsilon),
            lambda: lambda g, s: ppr_kernel(g, s, alpha, epsilon),
        )
        args = (graph, seed)
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    p, it = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(p=p, iterations=int(it), elapsed_ms=elapsed_ms)


def ppr_batch_kernel_spmm(
    graph: Graph,
    seeds,  # int32[K]
    alpha: float = 0.15,
    epsilon: float = 1e-6,
    max_iterations: int | None = None,
    layout=None,
    interpret: bool | None = None,
):
    """K-seed PPR with the batch axis on the SpMM K dimension: every push
    wave for all seeds is one [V, K] bucketed SpMM, so the windowed
    one-hot masks amortize across the whole seed batch (the same recast
    as msbfs/bc_batch). Returns (p f32[V, K], iterations)."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    V = graph.n_vertices
    K = seeds.shape[0]
    max_it = (2 * V) if max_iterations is None else max_iterations
    _2a1a = (2 * alpha) / (1 + alpha)
    _1a1a = (1 - alpha) / (1 + alpha)
    deg = jnp.diff(graph.row_offsets).astype(jnp.float32)
    if interpret is None:
        interpret = use_interpret()
    if layout is None:
        layout = build_auto_layout(
            hostcache.host(graph, "col_indices"), hostcache.host(graph, "edge_src"),
            np.ones(graph.n_edges, np.float32), V, interpret=interpret,
        )

    cols = jnp.arange(K)
    p0 = jnp.zeros((V, K), jnp.float32)
    r0 = jnp.zeros((V, K), jnp.float32).at[seeds, cols].set(1.0)
    front0 = jnp.zeros((V, K), bool).at[seeds, cols].set(True)

    def cond(c):
        it, front, p, r, rp = c
        return jnp.any(front) & (it < max_it)

    def body(c):
        it, front, p, r, rp = c
        p = jnp.where(front, p + _2a1a * r, p)
        rp = jnp.where(front, 0.0, rp)
        x = jnp.where(front, _1a1a * r / jnp.maximum(deg, 1.0)[:, None], 0.0)
        upd = bucketed_spmm(layout, x, interpret=interpret)
        thresh = (deg * epsilon)[:, None]
        new_rp = rp + upd
        new_front = (rp < thresh) & (new_rp >= thresh)
        return it + 1, new_front, p, new_rp, new_rp

    it, _, p, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), front0, p0, r0, r0)
    )
    return p, it


def run_batch(
    graph: Graph,
    seeds,
    alpha: float = 0.15,
    epsilon: float = 1e-6,
    warmup: bool = True,
    use_spmm: bool | None = None,
):
    """Multi-seed PPR (role of reference ``ppr::run_batch``,
    ppr.hxx:217-238). By default the seed batch rides the SpMM K axis on
    TPU (masks amortize across seeds); ``use_spmm=False`` falls back to
    vmap over the scalar kernel. Returns (p[n_seeds, V], elapsed_ms)."""
    seeds = jnp.asarray(seeds, dtype=jnp.int32)
    if use_spmm is None:
        import jax as _jax

        use_spmm = _jax.default_backend() not in ("cpu", "gpu")
    if use_spmm:
        import numpy as np

        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import build_auto_layout

        from gunrock_tpu.ops.pallas.semiring import pull_layout
        from gunrock_tpu.utils.jitcache import cached_jit

        interpret = use_interpret()
        layout = pull_layout(graph, unit=True, interpret=interpret)
        # layout as jit argument (closure would bake it into the HLO)
        fn = cached_jit(
            ("ppr_batch_spmm", alpha, epsilon, interpret),
            lambda: lambda g, ss, lay: ppr_batch_kernel_spmm(
                g, ss, alpha, epsilon, layout=lay, interpret=interpret
            )[0].T,
        )
    else:
        from gunrock_tpu.utils.jitcache import cached_jit

        layout = None
        fn = cached_jit(
            ("ppr_batch_vmap", alpha, epsilon),
            lambda: lambda g, ss, lay: jax.vmap(
                lambda s: ppr_kernel(g, s, alpha, epsilon)[0]
            )(ss),
        )
    if warmup:
        jax.block_until_ready(fn(graph, seeds, layout))
    t0 = time.perf_counter()
    p = jax.block_until_ready(fn(graph, seeds, layout))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return p, elapsed_ms
