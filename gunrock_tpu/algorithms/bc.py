"""Betweenness centrality (Brandes) from a source, plus all-sources batch.

Role of reference include/gunrock/algorithms/bc.hxx:

- forward sweep: level-synchronous BFS storing per-vertex depth labels and
  shortest-path counts sigma (atomic CAS label + atomic add sigma,
  bc.hxx:125-154),
- backward sweep over stored per-depth frontiers: for each edge
  (src, dst) with label[dst] == label[src] + 1,
  ``delta[src] += sigma[src]/sigma[dst] * (1 + delta[dst])`` and
  ``bc[src] += 0.5 * update`` (bc.hxx:158-192); the source vertex is
  excluded,
- all-sources: ``operators::batch`` fan-out accumulating into one
  bc_values array (bc.hxx:304-321).

TPU redesign: the reference's 1000-buffer frontier *stack* (bc.hxx:256-259)
is unnecessary — the depth labels array IS the stack (frontier at depth d
== ``labels == d``). Forward is the BFS cumsum-style expansion plus one
segmented sum for sigma; backward walks d = depth-1 .. 1 with one by-src
segmented sum per level; both are ``lax.while_loop``s. The all-sources
batch is ``vmap`` + sum over the source axis (ops.batch), replacing
std::thread fan-out.
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
    single_source: int


@dataclasses.dataclass
class Result:
    bc_values: jax.Array  # float32[V] (scaled by 0.5, reference parity)
    elapsed_ms: float


def _seg_count(active_int, offsets):
    """Per-destination segment sums via cumsum difference (CSC order)."""
    ce = jnp.concatenate([jnp.zeros(1, active_int.dtype), jnp.cumsum(active_int)])
    return ce[offsets[1:]] - ce[offsets[:-1]]


def bc_forward(graph: Graph, single_source):
    """Forward sweep. Returns (labels int32[V], sigma f32[V], depth)."""
    V = graph.n_vertices
    labels0 = jnp.full(V, -1, jnp.int32).at[single_source].set(0)
    sigma0 = jnp.zeros(V, jnp.float32).at[single_source].set(1.0)
    front0 = jnp.zeros(V, bool).at[single_source].set(True)

    def cond(c):
        it, front, labels, sigma = c
        return jnp.any(front) & (it < V)

    def body(c):
        it, front, labels, sigma = c
        active = front[graph.csc_rows]
        reached = _seg_count(active.astype(jnp.int32), graph.csc_offsets) > 0
        new = reached & (labels == -1)
        labels = jnp.where(new, it + 1, labels)
        # sigma spans the graph's full path-count dynamic range (up to
        # ~2^depth on meshes); the cumsum-difference reduction's GLOBAL
        # prefix catastrophically cancels small segments (a sigma=1
        # boundary vertex next to a sigma~1e17 hub in the same prefix),
        # so sigma uses within-segment scatter-add like geo's dinv —
        # error then accumulates only over each vertex's own in-edges
        sig_add = jax.ops.segment_sum(
            jnp.where(active, sigma[graph.csc_rows], 0.0),
            graph.csc_dst, num_segments=V, indices_are_sorted=True,
        )
        sigma = jnp.where(new, sig_add, sigma)
        return it + 1, new, labels, sigma

    depth, _, labels, sigma = jax.lax.while_loop(
        cond, body, (jnp.int32(0), front0, labels0, sigma0)
    )
    return labels, sigma, depth


def bc_kernel(graph: Graph, single_source):
    """Pure single-source BC. Returns bc contributions f32[V] (0.5-scaled,
    source excluded — reference bc.hxx:160-180 semantics)."""
    V = graph.n_vertices
    labels, sigma, depth = bc_forward(graph, single_source)
    sigma_safe = jnp.where(sigma > 0, sigma, 1.0)

    def cond(c):
        d, delta = c
        return d >= 1

    def body(c):
        d, delta = c
        src, dst = graph.edge_src, graph.col_indices
        on_level = (labels[src] == d) & (labels[dst] == d + 1)
        vals = jnp.where(
            on_level,
            sigma_safe[src] / sigma_safe[dst] * (1.0 + delta[dst]),
            0.0,
        )
        # within-segment sum (not cumsum-difference): see bc_forward —
        # per-edge dependency terms inherit sigma's dynamic range
        add = jax.ops.segment_sum(vals, src, num_segments=V,
                                  indices_are_sorted=True)
        delta = jnp.where(labels == d, delta + add, delta)
        return d - 1, delta

    _, delta = jax.lax.while_loop(
        cond, body, (depth - 1, jnp.zeros(V, jnp.float32))
    )
    bc = 0.5 * delta
    return bc.at[single_source].set(0.0)


def _bc_layouts(graph: Graph, interpret: bool):
    """Unit-weight pull (rows=dst) + push (rows=src) layouts — the SAME
    cache entries bfs/ppr/kcore/hits use (one E-sized layout per graph
    per orientation, not one per algorithm)."""
    from gunrock_tpu.ops.pallas.semiring import pull_layout, push_layout

    return (
        pull_layout(graph, unit=True, interpret=interpret),
        push_layout(graph, unit=True, interpret=interpret),
    )


def bc_kernel_pallas(
    graph: Graph,
    single_source,
    pull_layout,
    push_layout,
    interpret: bool = False,
):
    """Single-source BC on the frontier-sparse semiring kernels: ONE
    doubly-masked plus_times pass per forward level (sigma spread — a
    positive sum IS reachability, so no separate reach pass) and one per
    backward level (dependency push from level d+1 into level d, both
    level masks tiny -> chunks skip). Same contract as bc_kernel."""
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv_sparse

    V = graph.n_vertices
    labels0 = jnp.full(V, -1, jnp.int32).at[single_source].set(0)
    sigma0 = jnp.zeros(V, jnp.float32).at[single_source].set(1.0)
    front0 = jnp.zeros(V, bool).at[single_source].set(True)

    def fcond(c):
        it, front, labels, sigma = c
        return jnp.any(front) & (it < V)

    def fbody(c):
        it, front, labels, sigma = c
        unreached = labels == -1
        sig_add = bucketed_semiring_spmv_sparse(
            pull_layout, jnp.where(front, sigma, 0.0), front, "plus_times",
            interpret=interpret, out_mask=unreached,
            tail_grids=(2, 4, 8, 64),
        )
        new = unreached & (sig_add > 0)
        labels = jnp.where(new, it + 1, labels)
        sigma = jnp.where(new, sig_add, sigma)
        return it + 1, new, labels, sigma

    depth, _, labels, sigma = jax.lax.while_loop(
        fcond, fbody, (jnp.int32(0), front0, labels0, sigma0)
    )
    sigma_safe = jnp.where(sigma > 0, sigma, 1.0)

    def bcond(c):
        d, delta = c
        return d >= 1

    def bbody(c):
        d, delta = c
        up = labels == d + 1
        here = labels == d
        x = jnp.where(up, (1.0 + delta) / sigma_safe, 0.0)
        y = bucketed_semiring_spmv_sparse(
            push_layout, x, up, "plus_times",
            interpret=interpret, out_mask=here,
            tail_grids=(2, 4, 8, 64),
        )
        delta = jnp.where(here, delta + sigma_safe * y, delta)
        return d - 1, delta

    _, delta = jax.lax.while_loop(
        bcond, bbody, (depth - 1, jnp.zeros(V, jnp.float32))
    )
    bc = 0.5 * delta
    return bc.at[single_source].set(0.0)


def run(graph: Graph, single_source: int, options: Options | None = None,
        warmup: bool = True) -> Result:
    """Role of reference ``bc::run`` single-source (bc.hxx:276-292).
    Options route the strategy: the Pallas frontier-sparse path on TPU
    (default_options), the XLA cumsum-difference segment path otherwise."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH and graph.n_edges:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.utils.jitcache import cached_jit

        interpret = use_interpret()
        pl_, ps_ = _bc_layouts(graph, interpret)
        fn = cached_jit(
            ("bc_pallas", interpret),
            lambda: lambda g, s, a, b: bc_kernel_pallas(
                g, s, a, b, interpret=interpret
            ),
        )
        args = (graph, single_source, pl_, ps_)
    else:
        fn = jax.jit(bc_kernel)
        args = (graph, single_source)
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    bc = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(bc_values=bc, elapsed_ms=elapsed_ms)


def bc_batch_kernel(
    graph: Graph,
    sources,  # int32[K]
    pull_layout=None,
    push_layout=None,
    interpret: bool | None = None,
):
    """BC from K sources simultaneously via bucketed SpMM: the batch axis
    becomes the MXU's K axis, so the one-hot masks amortize across all
    sources (ops/pallas/spmm.py — ~50x per-source at K=128 vs per-source
    scatter kernels). Returns the summed 0.5-scaled dependency
    contributions f32[V] of this source chunk."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    V = graph.n_vertices
    K = sources.shape[0]
    if interpret is None:
        interpret = use_interpret()
    if pull_layout is None or push_layout is None:
        ones = np.ones(graph.n_edges, np.float32)
        pull_layout = build_auto_layout(
            hostcache.host(graph, "col_indices"), hostcache.host(graph, "edge_src"), ones,
            V, interpret=interpret,
        )
        push_layout = build_auto_layout(
            hostcache.host(graph, "edge_src"), hostcache.host(graph, "col_indices"), ones,
            V, interpret=interpret,
        )

    cols = jnp.arange(K)
    labels0 = jnp.full((V, K), -1, jnp.int32).at[sources, cols].set(0)
    sigma0 = jnp.zeros((V, K), jnp.float32).at[sources, cols].set(1.0)
    front0 = jnp.zeros((V, K), jnp.float32).at[sources, cols].set(1.0)

    def fcond(c):
        it, front, labels, sigma = c
        return jnp.any(front > 0) & (it < V)

    def fbody(c):
        it, front, labels, sigma = c
        # one pass per level: a positive sigma sum IS reachability
        # (sigma >= 1 on the frontier), so the separate reach SpMM the
        # round-1 kernel paid is gone
        sig_add = bucketed_spmm(pull_layout, front * sigma, interpret=interpret)
        new = (sig_add > 0) & (labels == -1)
        labels = jnp.where(new, it + 1, labels)
        sigma = jnp.where(new, sig_add, sigma)
        return it + 1, new.astype(jnp.float32), labels, sigma

    depth, _, labels, sigma = jax.lax.while_loop(
        fcond, fbody, (jnp.int32(0), front0, labels0, sigma0)
    )
    sigma_safe = jnp.where(sigma > 0, sigma, 1.0)

    def bcond(c):
        d, delta = c
        return d >= 1

    def bbody(c):
        d, delta = c
        x = jnp.where(labels == d + 1, (1.0 + delta) / sigma_safe, 0.0)
        y = bucketed_spmm(push_layout, x, interpret=interpret)
        delta = jnp.where(labels == d, delta + sigma_safe * y, delta)
        return d - 1, delta

    _, delta = jax.lax.while_loop(
        bcond, bbody, (depth - 1, jnp.zeros((V, K), jnp.float32))
    )
    delta = delta.at[sources, cols].set(0.0)
    return 0.5 * jnp.sum(delta, axis=1)


def run_all_sources_spmm(
    graph: Graph, chunk_size: int = 64, warmup: bool = True
) -> Result:
    """BC over every source through the batched SpMM kernel."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout

    V = graph.n_vertices
    interpret = use_interpret()
    ones = np.ones(graph.n_edges, np.float32)
    pl_ = build_auto_layout(
        hostcache.host(graph, "col_indices"), hostcache.host(graph, "edge_src"), ones,
        V, interpret=interpret,
    )
    ps_ = build_auto_layout(
        hostcache.host(graph, "edge_src"), hostcache.host(graph, "col_indices"), ones,
        V, interpret=interpret,
    )
    # layouts as jit arguments (closure would bake them into the HLO)
    fn = jax.jit(
        lambda g, ss, pl, ps: bc_batch_kernel(
            g, ss, pull_layout=pl, push_layout=ps, interpret=interpret
        )
    )
    n_chunks = -(-V // chunk_size)
    total = None
    t0 = time.perf_counter()
    for ci in range(n_chunks):
        srcs = np.arange(ci * chunk_size, min((ci + 1) * chunk_size, V))
        pad = chunk_size - srcs.size
        srcs_p = jnp.asarray(
            np.concatenate([srcs, np.zeros(pad, np.int64)]).astype(np.int32)
        )
        part = fn(graph, srcs_p, pl_, ps_)
        if pad:
            # padded duplicate sources recompute source 0's contribution;
            # subtract the extras
            extra = fn(graph, jnp.zeros(chunk_size, jnp.int32), pl_, ps_) * (
                pad / chunk_size
            )
            part = part - extra
        total = part if total is None else total + part
    total = jax.block_until_ready(total)
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(bc_values=total, elapsed_ms=elapsed_ms)


def run_all_sources(graph: Graph, chunk_size: int = 32, warmup: bool = True) -> Result:
    """BC from every source (role of reference ``bc::run(G, bc_values)``,
    bc.hxx:304-321): vmap over chunks of sources, summed."""
    V = graph.n_vertices

    def fn(g):
        sources = jnp.arange(V, dtype=jnp.int32)
        n_chunks = -(-V // chunk_size)
        pad = n_chunks * chunk_size - V
        padded = jnp.concatenate([sources, jnp.zeros(pad, jnp.int32)])
        chunks = padded.reshape(n_chunks, chunk_size)
        valid = (jnp.arange(n_chunks * chunk_size).reshape(n_chunks, chunk_size) < V)

        def one_chunk(carry, idx):
            srcs, mask = idx
            vals = jax.vmap(lambda s: bc_kernel(g, s))(srcs)
            vals = jnp.where(mask[:, None], vals, 0.0)
            return carry + vals.sum(axis=0), None

        total, _ = jax.lax.scan(
            one_chunk, jnp.zeros(V, jnp.float32), (chunks, valid)
        )
        return total

    jfn = jax.jit(fn)
    if warmup:
        jax.block_until_ready(jfn(graph))
    t0 = time.perf_counter()
    bc = jax.block_until_ready(jfn(graph))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(bc_values=bc, elapsed_ms=elapsed_ms)
