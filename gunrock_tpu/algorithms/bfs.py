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
    """Role of reference ``bfs::run`` (bfs.hxx:162-182)."""
    del options  # strategy selection folds into one XLA path for BFS
    if not 0 <= int(single_source) < graph.n_vertices:
        raise ValueError(
            f"source {single_source} out of range [0, {graph.n_vertices})"
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
