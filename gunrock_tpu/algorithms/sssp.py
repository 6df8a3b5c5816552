"""Single-source shortest paths (frontier Bellman-Ford).

Role of reference include/gunrock/algorithms/sssp.hxx: advance with
``atomic::min(dist[n], dist[src] + w)`` (sssp.hxx:116-130), a bypass filter
deduping by visited-iteration (sssp.hxx:132-151), and optional uniquify.

TPU redesign: each iteration is one masked segmented-min over the CSC
ordering — the relaxation of *all* out-edges of frontier vertices at once.
The new frontier is exactly the set of improved vertices, so the
reference's heuristic per-iteration dedup (visited-bitmap + best-effort
uniquify) is subsumed: the dense mask is exact. Final distances match the
reference (both are label-correcting Bellman-Ford fixpoints);
per-iteration frontiers may differ where the reference is
nondeterministic (SURVEY.md section 7 "hard parts").

Predecessors (declared but unimplemented in the reference,
sssp.hxx result_t) are recovered in finalize with one extra pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gunrock_tpu.framework.enactor import Enactor
from gunrock_tpu.framework.problem import Problem
from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options

INF = jnp.inf


@dataclasses.dataclass
class Param:
    single_source: int


@dataclasses.dataclass
class Result:
    distances: jax.Array  # float32[V]; +inf if unreachable
    predecessors: jax.Array  # int32[V]; -1 if unreachable / source
    search_depth: int
    elapsed_ms: float


def sssp_step(graph: Graph, frontier, distances):
    """One relaxation wave: relax all out-edges of frontier vertices."""
    src = graph.csc_rows
    active = frontier[src]
    cand = jnp.where(active, distances[src] + graph.csc_values, INF)
    relaxed = jax.ops.segment_min(
        cand,
        graph.csc_dst,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )
    improved = relaxed < distances
    distances = jnp.where(improved, relaxed, distances)
    return improved, distances


def sssp_kernel(graph: Graph, single_source, max_iterations: int | None = None):
    """Pure SSSP distances (vmap-friendly)."""
    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    dist0 = jnp.full(V, INF, dtype=jnp.float32).at[single_source].set(0.0)
    front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)

    def cond(carry):
        it, front, dist = carry
        return jnp.any(front) & (it < max_it)

    def body(carry):
        it, front, dist = carry
        front, dist = sssp_step(graph, front, dist)
        return it + 1, front, dist

    it, _, dist = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
    return dist, it


def sssp_push_step(graph: Graph, front_mask, distances, edge_budget: int):
    """Sparse push relaxation for small frontiers (the BFS push expansion
    carrying float distances): expand exactly the frontier's out-edges
    into a fixed budget and scatter-min the relaxed candidates."""
    V = graph.n_vertices
    E = graph.n_edges
    offs = graph.row_offsets
    Q = edge_budget

    (qdata,) = jnp.nonzero(front_mask, size=Q, fill_value=V)
    valid_q = qdata < V
    vs = jnp.where(valid_q, qdata, 0)
    degs = jnp.where(valid_q, offs[vs + 1] - offs[vs], 0)
    cum = jnp.cumsum(degs)
    total = cum[-1]
    starts = cum - degs

    j_ids = jnp.arange(Q, dtype=jnp.int32)
    marker = jnp.zeros(Q, jnp.int32).at[
        jnp.where(valid_q & (starts < Q), starts, Q)
    ].max(j_ids, mode="drop")
    qi = jax.lax.cummax(marker)
    v = qdata[jnp.minimum(qi, Q - 1)]
    e = offs[jnp.where(v < V, v, 0)] + (jnp.arange(Q, dtype=jnp.int32) - starts[qi])
    slot_valid = (jnp.arange(Q) < total) & (v < V)
    e = jnp.clip(e, 0, E - 1)
    nbr = graph.col_indices[e]
    cand = jnp.where(
        slot_valid, distances[jnp.where(v < V, v, 0)] + graph.values[e], jnp.inf
    )
    improved_slot = slot_valid & (cand < distances[nbr])
    tgt = jnp.where(improved_slot, nbr, V)
    new_dist = distances.at[tgt].min(
        jnp.where(improved_slot, cand, jnp.inf), mode="drop"
    )
    improved = new_dist < distances
    return improved, new_dist


def sssp_kernel_do(
    graph: Graph,
    single_source,
    max_iterations: int | None = None,
    edge_budget: int | None = None,
    layout=None,
    interpret: bool | None = None,
    layout_dense=None,
    init_state=None,
    stop=None,
    return_state: bool = False,
):
    """Direction-optimizing SSSP: sparse push relaxations for small
    frontiers (the dominant regime on long-diameter road networks), dense
    min-plus pull otherwise. When a Pallas ``layout`` is given the dense
    branch routes through the bucketed min-plus kernel (the fastest
    on-chip combination). ``layout_dense``: optional W=4096/C=1024
    mixed-layout tier for near-full waves (see bfs.bfs_kernel_do).
    Returns (distances, depth)."""
    V = graph.n_vertices
    E = graph.n_edges
    max_it = V if max_iterations is None else max_iterations
    if edge_budget is None:
        # E/128 (not BFS's E/64): weighted search revisits vertices, so
        # pushing a larger share of levels re-relaxes more stale edges —
        # a smaller budget shifts mid-size frontiers onto the
        # frontier-sparse Pallas pull. A/B at scale 18 (battery 5,
        # benchmarks/ab_sssp_do.py): E/128 124.4 ms vs E/64 136.5 ms.
        # Hub-ordered graphs: the degsort budget sweep plateaus at
        # E/160-E/384 (~111-113 ms); E/192 measured best.
        div = 192 if graph.properties.hub_ordered else 128
        edge_budget = max(4096, E // div)
    deg = jnp.diff(graph.row_offsets)
    if layout is not None:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.semiring import (
            _BIG,
            bucketed_semiring_spmv_sparse,
        )

        if interpret is None:
            interpret = use_interpret()

        def _pull(lay, front, dist):
            # frontier-sparse chunk-skipping kernel: mid-size frontiers
            # (too big for push, far smaller than E) only pay for chunks
            # whose source sub-block holds a frontier vertex. Tail grids
            # (8,64) measured best for min_plus at s18 degsort (98.6 ms
            # med vs 104.1 none / 101.9 with the extra /2,/4 tiers —
            # the deeper cond tree costs more than it saves here).
            x = jnp.where(front, dist, _BIG)
            relaxed = bucketed_semiring_spmv_sparse(
                lay, x, front, "min_plus", interpret=interpret,
                tail_grids=(8, 64),
            )
            improved = relaxed < dist
            return improved, jnp.minimum(dist, relaxed)

        def dense_step(front, dist):
            return _pull(layout, front, dist)

        if layout_dense is not None:

            def dense_big_step(front, dist):
                return _pull(layout_dense, front, dist)
        else:
            dense_big_step = None
    else:

        def dense_step(front, dist):
            return sssp_step(graph, front, dist)

        dense_big_step = None

    if init_state is None:
        dist0 = jnp.full(V, INF, dtype=jnp.float32).at[single_source].set(0.0)
        front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)
        it0 = jnp.int32(0)
    else:
        # resumable slab (round-slabbed driver below): continue from a
        # prior dispatch's carry — big-diameter graphs exceed the axon
        # RPC deadline when the whole loop is ONE dispatch
        it0, front0, dist0 = init_state
    limit = max_it if stop is None else stop

    def cond(c):
        it, front, dist = c
        return jnp.any(front) & (it < limit)

    def body(c):
        it, front, dist = c
        out_edges = jnp.sum(jnp.where(front, deg, 0))
        n_front = jnp.sum(front.astype(jnp.int32))
        use_push = (out_edges < jnp.int32(edge_budget)) & (
            n_front < jnp.int32(edge_budget)
        )

        def push(args):
            front, dist = args
            return sssp_push_step(graph, front, dist, edge_budget)

        def pull(args):
            front, dist = args
            return dense_step(front, dist)

        if dense_big_step is None:
            front, dist = jax.lax.cond(use_push, push, pull, (front, dist))
        else:

            def pull_big(args):
                front, dist = args
                return dense_big_step(front, dist)

            # mixed-layout tier (see bfs.py): near-full waves take the
            # big-chunk layout's lower per-grid-step floor
            big = out_edges >= jnp.int32(E // 2)
            branch = jnp.where(use_push, 0, jnp.where(big, 2, 1))
            front, dist = jax.lax.switch(
                branch, [push, pull, pull_big], (front, dist)
            )
        return it + 1, front, dist

    state = jax.lax.while_loop(cond, body, (it0, front0, dist0))
    if return_state:
        return state
    it, _, dist = state
    return dist, it


def sssp_do_slabbed(
    graph: Graph,
    single_source,
    rounds_per_dispatch: int = 256,
    layout=None,
    interpret: bool | None = None,
):
    """Round-slabbed direction-optimized SSSP for BIG-DIAMETER graphs:
    the host re-dispatches the (resumable) while_loop every
    ``rounds_per_dispatch`` BSP rounds, so no single device execution
    exceeds the axon RPC deadline (road-class inputs run thousands of
    rounds — one-dispatch forms die UNAVAILABLE, the geo round-3 /
    SpGEMM round-4 failure class). One scalar device->host read per
    slab. Returns (distances, depth)."""
    from gunrock_tpu.utils.jitcache import cached_jit

    V = graph.n_vertices
    fn = cached_jit(
        ("sssp_do_slab", layout is not None, interpret),
        lambda: lambda g, st, stop, lay: sssp_kernel_do(
            g, 0, layout=lay, interpret=interpret,
            init_state=st, stop=stop, return_state=True,
        ),
    )
    dist0 = jnp.full(V, INF, dtype=jnp.float32).at[single_source].set(0.0)
    front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)
    state = (jnp.int32(0), front0, dist0)
    while True:
        stop = int(state[0]) + rounds_per_dispatch
        state = fn(graph, state, jnp.int32(stop), layout)
        if not bool(jnp.any(state[1])) or int(state[0]) >= V:
            break
    return state[2], state[0]


def sssp_kernel_delta(
    graph: Graph,
    single_source,
    delta: float | None = None,
    max_iterations: int | None = None,
    edge_budget: int | None = None,
):
    """Bucketed (delta-stepping style) SSSP: each round relaxes only the
    improved vertices whose tentative distance falls in the current
    bucket ``[0, (k+1)*delta)``; when the bucket settles, k advances.
    The Davidson/delta-stepping idea the reference stubs as the
    ``bucketing`` load balancer (advance/bucketing.hxx "wip") — here it
    bounds the number of BSP rounds on long-diameter weighted graphs
    while every relaxation stays a sparse push. Exact distances (no
    light/heavy approximation: re-improved vertices simply re-enter).

    Returns (distances f32[V], rounds)."""
    import numpy as np

    V = graph.n_vertices
    E = graph.n_edges
    max_it = (4 * V) if max_iterations is None else max_iterations
    if edge_budget is None:
        edge_budget = max(4096, E // 64)
    if delta is None:
        # mean weight * a small multiple: buckets hold a few waves each
        # (traced mean keeps this jit-safe; delta is a runtime scalar)
        delta = jnp.mean(graph.values) * 4.0
    deg = jnp.diff(graph.row_offsets)

    dist0 = jnp.full(V, INF, dtype=jnp.float32).at[single_source].set(0.0)
    imp0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)

    def cond(c):
        it, k, improved, dist = c
        return jnp.any(improved) & (it < max_it)

    def body(c):
        it, k, improved, dist = c
        thresh = (k + 1.0) * delta
        front = improved & (dist < thresh)
        have = jnp.any(front)
        out_edges = jnp.sum(jnp.where(front, deg, 0))
        n_front = jnp.sum(front.astype(jnp.int32))
        fits = (out_edges < jnp.int32(edge_budget)) & (
            n_front < jnp.int32(edge_budget)
        )

        def relax_push(args):
            front, improved, dist = args
            new_imp, dist = sssp_push_step(graph, front, dist, edge_budget)
            return improved & ~front | new_imp, dist

        def relax_dense(args):
            front, improved, dist = args
            new_imp, dist = sssp_step(graph, front, dist)
            return improved & ~front | new_imp, dist

        def relax(args):
            return jax.lax.cond(fits, relax_push, relax_dense, args)

        def advance_bucket(args):
            front, improved, dist = args
            return improved, dist

        improved, dist = jax.lax.cond(
            have, relax, advance_bucket, (front, improved, dist)
        )
        k = jnp.where(have, k, k + 1.0)
        return it + 1, k, improved, dist

    it, _, _, dist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(0.0), imp0, dist0)
    )
    return dist, it


def sssp_kernel_pallas(
    graph: Graph,
    single_source,
    layout=None,
    max_iterations: int | None = None,
    interpret: bool | None = None,
):
    """SSSP with the Pallas min-plus semiring advance (the merge-path
    analog, ops/pallas/semiring.py): each wave relaxes all in-edges of
    every vertex against the frontier's distances in one bucketed
    windowed-one-hot kernel."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.semiring import _BIG, bucketed_semiring_spmv, pull_layout

    if layout is None:
        layout = pull_layout(graph, pad_value=_BIG)
    if interpret is None:
        interpret = use_interpret()
    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    dist0 = jnp.full(V, INF, dtype=jnp.float32).at[single_source].set(0.0)
    front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)

    def cond(c):
        it, front, dist = c
        return jnp.any(front) & (it < max_it)

    def body(c):
        it, front, dist = c
        x = jnp.where(front, dist, _BIG)
        relaxed = bucketed_semiring_spmv(layout, x, "min_plus", interpret=interpret)
        improved = relaxed < dist
        dist = jnp.minimum(dist, relaxed)
        return it + 1, improved, dist

    it, _, dist = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
    return dist, it


def recover_predecessors(graph: Graph, distances):
    """One pass over edges: pred[v] = min src with dist[src]+w == dist[v]."""
    src = graph.csc_rows
    tight = jnp.isclose(distances[src] + graph.csc_values, distances[graph.csc_dst]) & (
        distances[src] < INF
    )
    pred = jax.ops.segment_min(
        jnp.where(tight, src, jnp.iinfo(jnp.int32).max),
        graph.csc_dst,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )
    return jnp.where(
        (pred == jnp.iinfo(jnp.int32).max) | jnp.isinf(distances), -1, pred
    ).astype(jnp.int32)


class SsspProblem(Problem):
    def __init__(self, graph: Graph, param: Param):
        super().__init__(graph)
        self.param = param

    def reset(self):
        V = self.graph.n_vertices
        src = self.param.single_source
        return {
            "distances": jnp.full(V, INF, dtype=jnp.float32).at[src].set(0.0),
            "frontier": jnp.zeros(V, dtype=bool).at[src].set(True),
        }


class SsspEnactor(Enactor):
    def prepare_frontier(self):
        return self.problem.reset()

    def loop(self, state):
        front, dist = sssp_step(self.problem.graph, state["frontier"], state["distances"])
        return {**state, "frontier": front, "distances": dist}

    def finalize(self, state):
        state = dict(state)
        state["predecessors"] = recover_predecessors(
            self.problem.graph, state["distances"]
        )
        return state


def run(
    graph: Graph,
    single_source: int,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``sssp::run`` (sssp.hxx:177-198). The advance
    strategy is runtime-selected via ``options.load_balance`` (the
    reference's execute_runtime dispatch, advance.hxx:247-275):
    PALLAS_MERGE_PATH routes through the bucketed min-plus kernel."""
    if not 0 <= int(single_source) < graph.n_vertices:
        raise ValueError(
            f"source {single_source} out of range [0, {graph.n_vertices})"
        )
    from gunrock_tpu.ops.configs import AdvanceDirection, LoadBalance, default_options

    if options is None:
        options = default_options()
    if options.load_balance == LoadBalance.BUCKETING:
        import time

        from gunrock_tpu.utils.jitcache import cached_jit

        fn = cached_jit(
            "sssp_delta", lambda: lambda g, s: sssp_kernel_delta(g, s)
        )
        if warmup:
            jax.block_until_ready(fn(graph, single_source))
        t0 = time.perf_counter()
        dist, it = jax.block_until_ready(fn(graph, single_source))
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return Result(
            distances=dist,
            predecessors=recover_predecessors(graph, dist),
            search_depth=int(it),
            elapsed_ms=elapsed_ms,
        )
    if getattr(options, "advance_direction", None) == AdvanceDirection.OPTIMIZED:
        import time

        layout = None
        layout_dense = None
        if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
            from gunrock_tpu.ops.pallas.semiring import _BIG, pull_layout

            layout = pull_layout(graph, pad_value=_BIG)
            # NO mixed-layout tier here (unlike BFS): min_plus has no MXU
            # scatter form, so the W=4096 big-chunk pass DOUBLES the VPU
            # one-hot scatter work per edge — measured 115.3 vs 100.7 ms
            # med at s18 degsort. layout_dense stays available via the
            # kernel arg for weighted graphs that profit (none measured).
        # layout as jit ARGUMENT, not closure: closed-over device arrays
        # become HLO constants and overflow the axon remote-compile
        # payload at scale 20 (HTTP 413)
        from gunrock_tpu.utils.jitcache import cached_jit

        fn = cached_jit(
            ("sssp_do", layout_dense is not None),
            lambda: lambda g, s, lay, lay_d: sssp_kernel_do(
                g, s, layout=lay, layout_dense=lay_d
            ),
        )
        if warmup:
            jax.block_until_ready(fn(graph, single_source, layout, layout_dense))
        t0 = time.perf_counter()
        dist, it = jax.block_until_ready(
            fn(graph, single_source, layout, layout_dense)
        )
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return Result(
            distances=dist,
            predecessors=recover_predecessors(graph, dist),
            search_depth=int(it),
            elapsed_ms=elapsed_ms,
        )

    if options is not None and options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
        from gunrock_tpu.ops.pallas.semiring import _BIG, pull_layout

        layout = pull_layout(graph, pad_value=_BIG)
        fn = jax.jit(
            lambda g, s, lay: sssp_kernel_pallas(g, s, layout=lay)
        )
        import time

        if warmup:
            jax.block_until_ready(fn(graph, single_source, layout))
        t0 = time.perf_counter()
        dist, it = jax.block_until_ready(fn(graph, single_source, layout))
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return Result(
            distances=dist,
            predecessors=recover_predecessors(graph, dist),
            search_depth=int(it),
            elapsed_ms=elapsed_ms,
        )

    problem = SsspProblem(graph, Param(single_source))
    enactor = SsspEnactor(problem)
    state, elapsed_ms = enactor.enact(warmup=warmup)
    return Result(
        distances=state["distances"],
        predecessors=state["predecessors"],
        search_depth=int(state["iteration"]),
        elapsed_ms=elapsed_ms,
    )
