"""Breadth-first search: hop distances (+ predecessors) from a source.

Role of reference include/gunrock/algorithms/bfs.hxx. The reference loop is
``advance`` with an ``atomic::min(distances[n], iteration+1)`` edge lambda
(bfs.hxx:105-128) followed by an optional filter (bfs.hxx:142-146),
iterating until the frontier is empty.

TPU redesign: the whole level-synchronous search is one
``lax.while_loop``. Each iteration is a single masked segmented-max over
the CSC ordering ("which unvisited vertices have a frontier in-neighbor"),
which *is* the advance+filter fusion — frontier dedup is implicit in the
dense mask (no uniquify needed), and the atomic-min becomes a
first-reached level assignment (exactly equal for level-sync BFS).

Predecessors (absent in the reference) fall out for free as a
segment-min over active edges' source ids.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import hostcache

from gunrock_tpu.framework.enactor import Enactor
from gunrock_tpu.framework.problem import Problem
from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options

UNREACHED = jnp.iinfo(jnp.int32).max


@dataclasses.dataclass
class Param:
    single_source: int


@dataclasses.dataclass
class Result:
    distances: jax.Array  # int32[V]; UNREACHED (int32 max) if unreachable
    predecessors: jax.Array  # int32[V]; -1 if unreachable / source
    search_depth: int
    elapsed_ms: float


def bfs_step(graph: Graph, frontier, distances, predecessors, iteration):
    """One level-synchronous BFS expansion (pure, jit/vmap-friendly).

    The advance+filter fusion: new frontier = unvisited vertices with an
    in-neighbor in the current frontier. The per-destination "any active
    in-edge" reduction is a cumsum difference over the CSC ordering
    (TPU-friendly prefix sum + two offset gathers) rather than a
    duplicate-index scatter, which XLA serializes on TPU.
    """
    active = frontier[graph.csc_rows]
    ce = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(active.astype(jnp.int32))]
    )
    reached = (ce[graph.csc_offsets[1:]] - ce[graph.csc_offsets[:-1]]) > 0
    new = reached & (distances == UNREACHED)
    distances = jnp.where(new, iteration + 1, distances)
    if predecessors is not None:
        pred_cand = jax.ops.segment_min(
            jnp.where(active, graph.csc_rows, UNREACHED),
            graph.csc_dst,
            num_segments=graph.n_vertices,
            indices_are_sorted=True,
        )
        predecessors = jnp.where(new, pred_cand, predecessors)
    return new, distances, predecessors


def bfs_push_step(graph: Graph, front_mask, distances, iteration, edge_budget: int):
    """Sparse push expansion for small frontiers: compact the mask to a
    queue, expand exactly its out-edges into a fixed edge budget, and
    relax the neighbors. All index math is scatter/cummax based (no
    per-edge searchsorted). Budget overflow never happens by construction:
    the caller only takes this branch when the frontier's out-degree sum
    fits (the direction-optimizing switch)."""
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

    # expansion: slot i belongs to the largest queue item j with
    # starts[j] <= i — a scatter-max of j at starts[j] + a running max
    j_ids = jnp.arange(Q, dtype=jnp.int32)
    marker = jnp.zeros(Q, jnp.int32).at[
        jnp.where(valid_q & (starts < Q), starts, Q)
    ].max(j_ids, mode="drop")
    qi = jax.lax.cummax(marker)
    v = qdata[jnp.minimum(qi, Q - 1)]
    e = offs[jnp.where(v < V, v, 0)] + (jnp.arange(Q, dtype=jnp.int32) - starts[qi])
    slot_valid = (jnp.arange(Q) < total) & (v < V)
    nbr = graph.col_indices[jnp.clip(e, 0, E - 1)]
    new = slot_valid & (distances[nbr] == UNREACHED)
    tgt = jnp.where(new, nbr, V)
    distances = distances.at[tgt].min(iteration + 1, mode="drop")
    new_mask = jnp.zeros(V, bool).at[tgt].set(True, mode="drop")
    return new_mask, distances


def bfs_kernel_do(
    graph: Graph,
    single_source,
    max_iterations: int | None = None,
    edge_budget: int | None = None,
    layout=None,
    interpret: bool | None = None,
    layout_dense=None,
):
    """Direction-optimizing BFS (the reference's declared-but-unbuilt
    ``advance_direction_t::optimized``, configs.hxx:78-82): per level,
    switch between the sparse push expansion (small frontiers — work
    proportional to the frontier's out-edges) and the dense cumsum pull
    (large frontiers — the full-edge pass). When a Pallas ``layout``
    (unit pull) is given, the dense pass is the doubly-masked
    frontier-sparse max_times kernel: source windows without a frontier
    vertex AND destination windows without an unreached vertex both
    skip, so late levels shrink with the unreached set.

    ``layout_dense`` (optional, W=4096/C=1024): a third dispatch tier for
    NEAR-FULL frontiers — the v5 pass is per-grid-step bound, so the
    peak levels (where window skipping buys nothing) run ~20% faster on
    half the grid steps, while collapsed frontiers keep the fine-skip
    W=2048 layout (mixed-layout DO; BASELINE round-4 chunk sweep).
    Returns (distances, depth)."""
    V = graph.n_vertices
    E = graph.n_edges
    max_it = V if max_iterations is None else max_iterations
    if edge_budget is None:
        # Small budget: the push branch's cost is O(budget) every time it
        # fires, so it must stay well under the dense pass's O(E) — E/64
        # keeps push ~1/64th the dense cost while covering the small
        # head/tail levels (and nearly every level of long-diameter road
        # networks). Measured 3.7x on a 512x512 grid vs always-dense.
        # Hub-ordered graphs (degree_sort) flip the trade: the doubly-
        # masked Pallas pull is so much cheaper that almost-always-pull
        # wins (s18 degsort sweep: E/512 52.2 ms < E/256 53.3 < E/64
        # 66.7; E/2048 55.5 overshoots — the first tiny levels still
        # want push).
        div = 512 if graph.properties.hub_ordered else 64
        edge_budget = max(4096, E // div)
    deg = jnp.diff(graph.row_offsets)

    if layout is not None:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv_sparse

        if interpret is None:
            interpret = use_interpret()

        def _pull(lay, front, dist, it):
            unreached = dist == UNREACHED
            # plus_times + exact: with a 0/1 frontier, "reached" only
            # needs count > 0, and plus_times rides the v5 MXU one-hot
            # scatter with a SINGLE bf16 matmul (exact=True: 1.0 msgs
            # are bf16-exact; the MXU accumulates in f32 so counts stay
            # exact) — max_times would fall back to the VPU one-hot
            # tail grids (2,4,8,64): with sub-block chunk-activity bits
            # the mid-density levels are 10-30% active — the /2 and /4
            # tiers cut those passes 2-4x (s18 degsort level probe:
            # level 2 = 22% of chunks, level 3 = 10%)
            y = bucketed_semiring_spmv_sparse(
                lay, front.astype(jnp.float32), front, "plus_times",
                interpret=interpret, out_mask=unreached, exact=True,
                unit=True,
                tail_grids=(2, 4, 8, 64),
            )
            new = (y > 0.5) & unreached
            return new, jnp.where(new, it + 1, dist)

        def dense_step(front, dist, it):
            return _pull(layout, front, dist, it)

        if layout_dense is not None:

            def dense_big_step(front, dist, it):
                return _pull(layout_dense, front, dist, it)
        else:
            dense_big_step = None
    else:
        dense_big_step = None

        def dense_step(front, dist, it):
            front, dist, _ = bfs_step(graph, front, dist, None, it)
            return front, dist

    dist0 = jnp.full(V, UNREACHED, dtype=jnp.int32).at[single_source].set(0)
    front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)

    def cond(c):
        it, front, dist = c
        return jnp.any(front) & (it < max_it)

    def body(c):
        it, front, dist = c
        out_edges = jnp.sum(jnp.where(front, deg, 0))
        n_front = jnp.sum(front.astype(jnp.int32))
        use_push = (out_edges < jnp.int32(edge_budget)) & (
            n_front < jnp.int32(edge_budget)
        )

        def push(args):
            front, dist = args
            return bfs_push_step(graph, front, dist, it, edge_budget)

        def pull(args):
            front, dist = args
            return dense_step(front, dist, it)

        if dense_big_step is None:
            front, dist = jax.lax.cond(use_push, push, pull, (front, dist))
        else:

            def pull_big(args):
                front, dist = args
                return dense_big_step(front, dist, it)

            # peak-level tier: when the frontier's out-edges cover HALF
            # the graph, chunk skipping is moot — take the big-chunk
            # layout's lower per-grid-step floor instead. (E//4 was the
            # first cut; with sub-block activity bits the 25-50% levels
            # skip enough chunks that the fine W=2048 layout + /2 tier
            # beats the big layout's full grid.)
            big = out_edges >= jnp.int32(E // 2)
            branch = jnp.where(use_push, 0, jnp.where(big, 2, 1))
            front, dist = jax.lax.switch(
                branch, [push, pull, pull_big], (front, dist)
            )
        return it + 1, front, dist

    it, _, dist = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
    return dist, it


def msbfs_kernel(
    graph: Graph,
    sources,  # int32[K]
    pull_layout=None,
    max_iterations: int | None = None,
    interpret: bool | None = None,
):
    """Multi-source BFS via the MXU SpMM kernel: K searches share every
    one-hot mask (the strongest form of the reference's batch operator —
    batch/batch.hxx std::thread fan-out -> a matmul K axis). Returns
    (distances int32[V, K], depth)."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    V = graph.n_vertices
    K = sources.shape[0]
    max_it = V if max_iterations is None else max_iterations
    if interpret is None:
        interpret = use_interpret()
    if pull_layout is None:
        pull_layout = build_auto_layout(
            hostcache.host(graph, "col_indices"),
            hostcache.host(graph, "edge_src"),
            np.ones(graph.n_edges, np.float32),  # unit weights: hop counts
            V,
            interpret=interpret,
        )

    cols = jnp.arange(K)
    dist0 = jnp.full((V, K), UNREACHED, jnp.int32).at[sources, cols].set(0)
    front0 = jnp.zeros((V, K), jnp.float32).at[sources, cols].set(1.0)

    def cond(c):
        it, front, dist = c
        return jnp.any(front > 0) & (it < max_it)

    def body(c):
        it, front, dist = c
        # exact mode: {0,1} frontier one-hots are bf16-exact — half the
        # x DMA and MXU work of the generic hi+lo split
        reached = (
            bucketed_spmm(pull_layout, front, interpret=interpret, exact=True)
            > 0.5
        )
        new = reached & (dist == UNREACHED)
        dist = jnp.where(new, it + 1, dist)
        return it + 1, new.astype(jnp.float32), dist

    it, _, dist = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
    return dist, it


def bfs_kernel(
    graph: Graph,
    single_source,
    max_iterations: int | None = None,
    compute_predecessors: bool = True,
):
    """Pure BFS: returns (distances, predecessors, depth). vmap over
    sources for batch BFS (the reference's operators::batch analog).
    ``compute_predecessors=False`` skips the pred segmented-min (the
    reference computes no predecessors at all) — the fastest path."""
    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    dist0 = jnp.full(V, UNREACHED, dtype=jnp.int32).at[single_source].set(0)
    pred0 = jnp.full(V, -1, dtype=jnp.int32) if compute_predecessors else None
    front0 = jnp.zeros(V, dtype=bool).at[single_source].set(True)

    def cond(carry):
        it, front, dist, pred = carry
        return jnp.any(front) & (it < max_it)

    def body(carry):
        it, front, dist, pred = carry
        front, dist, pred = bfs_step(graph, front, dist, pred, it)
        return it + 1, front, dist, pred

    if compute_predecessors:
        it, _, dist, pred = jax.lax.while_loop(
            cond, body, (jnp.int32(0), front0, dist0, pred0)
        )
        return dist, pred, it

    def cond2(carry):
        it, front, dist = carry
        return jnp.any(front) & (it < max_it)

    def body2(carry):
        it, front, dist = carry
        front, dist, _ = bfs_step(graph, front, dist, None, it)
        return it + 1, front, dist

    it, _, dist = jax.lax.while_loop(cond2, body2, (jnp.int32(0), front0, dist0))
    return dist, None, it


class BfsProblem(Problem):
    def __init__(self, graph: Graph, param: Param):
        super().__init__(graph)
        self.param = param

    def reset(self):
        V = self.graph.n_vertices
        src = self.param.single_source
        return {
            "distances": jnp.full(V, UNREACHED, dtype=jnp.int32).at[src].set(0),
            "predecessors": jnp.full(V, -1, dtype=jnp.int32),
            "frontier": jnp.zeros(V, dtype=bool).at[src].set(True),
        }


class BfsEnactor(Enactor):
    """Reference enactor pattern (bfs.hxx:75-147): prepare a single-vertex
    frontier, loop advance(+implicit filter) until empty."""

    def prepare_frontier(self):
        return self.problem.reset()

    def loop(self, state):
        front, dist, pred = bfs_step(
            self.problem.graph,
            state["frontier"],
            state["distances"],
            state["predecessors"],
            state["iteration"],
        )
        return {**state, "frontier": front, "distances": dist, "predecessors": pred}


def run(
    graph: Graph,
    single_source: int,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``bfs::run`` (bfs.hxx:162-182).

    ``options.advance_direction == OPTIMIZED`` (or passing no options at
    all on large graphs) selects the direction-optimizing kernel — the
    push/pull switch the reference declares but never built
    (configs.hxx:78-82). Predecessors come from one post-pass."""
    if not 0 <= int(single_source) < graph.n_vertices:
        raise ValueError(
            f"source {single_source} out of range [0, {graph.n_vertices})"
        )
    from gunrock_tpu.ops.configs import AdvanceDirection, default_options

    if options is None:
        options = default_options()
    use_do = (
        getattr(options, "advance_direction", None) == AdvanceDirection.OPTIMIZED
    )
    if use_do:
        import time

        from gunrock_tpu.ops.configs import LoadBalance

        layout = None
        layout_dense = None
        if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
            from gunrock_tpu.ops.pallas import use_interpret
            from gunrock_tpu.ops.pallas.layout import dense_window_chunk
            from gunrock_tpu.ops.pallas.semiring import pull_layout

            layout = pull_layout(graph, unit=True)
            # mixed-layout DO: peak levels take the big-chunk layout's
            # lower grid-step floor (dense_window_chunk; ~20%/pass)
            dwc = dense_window_chunk(graph.n_vertices, use_interpret())
            if dwc is not None:
                layout_dense = pull_layout(
                    graph, unit=True, window=dwc[0], chunk=dwc[1]
                )
        # layout rides as a jit ARGUMENT: closed-over device arrays become
        # HLO constants, and at scale 20 the embedded layout overflows the
        # axon remote-compile payload (HTTP 413)
        from gunrock_tpu.utils.jitcache import cached_jit

        fn = cached_jit(
            ("bfs_do", layout_dense is not None),
            lambda: lambda g, s, lay, lay_d: bfs_kernel_do(
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
            predecessors=_predecessors_from_distances(graph, dist),
            search_depth=int(it),
            elapsed_ms=elapsed_ms,
        )
    problem = BfsProblem(graph, Param(single_source))
    enactor = BfsEnactor(problem)
    state, elapsed_ms = enactor.enact(warmup=warmup)
    return Result(
        distances=state["distances"],
        predecessors=state["predecessors"],
        search_depth=int(state["iteration"]),
        elapsed_ms=elapsed_ms,
    )


def _predecessors_from_distances(graph: Graph, distances):
    """pred[v] = min in-neighbor u with dist[u] == dist[v] - 1."""
    src = graph.csc_rows
    ok = distances[src] + 1 == distances[graph.csc_dst]
    pred = jax.ops.segment_min(
        jnp.where(ok, src, UNREACHED),
        graph.csc_dst,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )
    return jnp.where(
        (pred == UNREACHED) | (distances == UNREACHED), -1, pred
    ).astype(jnp.int32)
