"""K-core decomposition: the core number of every vertex.

Role of reference include/gunrock/algorithms/kcore.hxx — an outer loop over
``k = 1, 2, ...`` with a nested inner peel: mark vertices of (residual)
degree <= k deleted with ``k_cores[v] = k``, decrement their neighbors'
degrees, repeat until no vertex peels at this k; converge when every
vertex is deleted (kcore.hxx:139-202). The reference's iteration count at
convergence is the graph's degeneracy.

TPU redesign: one flat ``lax.while_loop`` carrying ``(k, degrees, deleted,
k_cores)``. Three round-count/cost optimizations over the naive flattening:

1. **fused k-jump** — k is raised to the minimum remaining residual
   degree at the START of every round (``k = max(k, min_alive_deg)``),
   so every round peels at least one vertex: empty k levels cost zero
   rounds AND no round is ever spent just discovering that a level is
   done (the classic bucket skip costs one no-peel round per level;
   fusing it removes ~one round per distinct core value).
2. **unconditional edge pass** — because the fused k-jump guarantees
   every round peels at least one vertex, the O(E) neighbor-decrement
   runs unconditionally (the earlier ``lax.cond`` guard only paid off
   when no-peel rounds existed; the k-jump removed those rounds).
3. **Pallas decrement** — the decrement is a plus_times semiring advance
   over a unit-weight layout (the bucketed MXU/VPU kernel) instead of an
   E-wide gather + segmented count, when options select the Pallas path.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp


from gunrock_tpu.framework.enactor import Enactor
from gunrock_tpu.framework.problem import Problem
from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options

_BIG_DEG = jnp.int32(2**30)


@dataclasses.dataclass
class Param:
    pass


@dataclasses.dataclass
class Result:
    k_cores: jax.Array  # int32[V]
    degeneracy: int
    elapsed_ms: float
    rounds: int = 0  # while_loop iterations (= peel waves; fused k-jump)


def kcore_kernel(graph: Graph, decrement_fn=None, layout=None):
    """Pure k-core. Returns (k_cores int32[V], degeneracy).

    ``decrement_fn(peel_mask, alive_mask, layout) -> int32[V]`` computes,
    for every vertex, the number of edges connecting it to peeled vertices
    (counts for non-alive vertices may be garbage — their degrees are
    never consulted again); defaults to the XLA gather + sorted segmented
    count. ``layout`` is threaded through (a jit argument at the call
    site, so Pallas layouts don't become HLO constants)."""
    V = graph.n_vertices
    # self loops are excluded from peel degrees (deviation from
    # kcore.hxx:79-84, which counts them and disagrees with the standard
    # core-number definition on non-simple inputs; matches networkx and
    # this framework's other algorithms). A peeled vertex's self edge
    # only ever decrements the vertex itself, whose degree is never
    # consulted again — so only the INITIAL degrees need the correction.
    self_loops = jax.ops.segment_sum(
        (graph.edge_src == graph.col_indices).astype(jnp.int32),
        graph.edge_src, num_segments=V, indices_are_sorted=True,
    )
    deg0 = graph.out_degrees().astype(jnp.int32) - self_loops

    if decrement_fn is None:

        def decrement_fn(peel, alive, lay):
            from gunrock_tpu.ops.segment import seg_count_sorted

            return seg_count_sorted(peel[graph.csc_rows], graph.csc_offsets)

    def cond(carry):
        k, deg, deleted, cores, rounds = carry
        return ~jnp.all(deleted)

    def body(carry):
        k, deg, deleted, cores, rounds = carry
        # fused k-jump: every alive vertex has residual degree >=
        # min_remaining, so the alive subgraph is contained in its own
        # min_remaining-core — raising k to it up front is safe and
        # guarantees this round peels the argmin vertex (no wasted
        # "discover the level is done" rounds).
        min_remaining = jnp.min(jnp.where(deleted, _BIG_DEG, deg))
        k = jnp.maximum(k, min_remaining)
        peel = (~deleted) & (deg <= k)
        cores = jnp.where(peel, k, cores)
        deleted = deleted | peel
        # Each peeled vertex decrements every neighbor's residual degree
        # once per connecting edge (kcore.hxx:158-166). Every round
        # peels (cond above), so the pass is unconditional.
        deg = deg - decrement_fn(peel, ~deleted, layout)
        return k, deg, deleted, cores, rounds + 1

    k, _, _, cores, rounds = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(1),
            deg0,
            jnp.zeros(V, dtype=bool),
            jnp.zeros(V, dtype=jnp.int32),
            jnp.int32(0),
        ),
    )
    return cores, jnp.max(cores), rounds


class KCoreProblem(Problem):
    """Role of reference kcore problem_t (kcore.hxx:54-101): persistent
    degrees/deleted/cores state. The Pallas layout rides INSIDE the
    state pytree so it stays a jit argument (a closure would bake it
    into the HLO — the round-2 HTTP-413 trap)."""

    def __init__(self, graph: Graph, layout=None):
        super().__init__(graph)
        self.layout = layout

    def reset(self):
        V = self.graph.n_vertices
        self_loops = jax.ops.segment_sum(
            (self.graph.edge_src == self.graph.col_indices).astype(
                jnp.int32
            ),
            self.graph.edge_src, num_segments=V, indices_are_sorted=True,
        )
        deg0 = self.graph.out_degrees().astype(jnp.int32) - self_loops
        return {
            "k": jnp.int32(1),
            "degrees": deg0,
            "frontier": jnp.ones(V, bool),  # alive = not deleted
            "cores": jnp.zeros(V, jnp.int32),
            "layout": self.layout,
        }


class KCoreEnactor(Enactor):
    """Reference enactor pattern (kcore.hxx:139-202) on the framework
    skeleton: loop = k-jump + peel + decrement; converged when the alive
    frontier empties. Same math as :func:`kcore_kernel` (the fused
    k-jump docstring above)."""

    def __init__(self, problem, decrement_fn=None):
        super().__init__(problem)
        self._decrement = decrement_fn

    def prepare_frontier(self):
        return self.problem.reset()

    def loop(self, state):
        k, deg = state["k"], state["degrees"]
        alive, cores = state["frontier"], state["cores"]
        min_remaining = jnp.min(jnp.where(alive, deg, _BIG_DEG))
        k = jnp.maximum(k, min_remaining)
        peel = alive & (deg <= k)
        cores = jnp.where(peel, k, cores)
        alive = alive & ~peel
        if self._decrement is not None:
            dec = self._decrement(peel, alive, state["layout"])
        else:
            from gunrock_tpu.ops.segment import seg_count_sorted

            g = self.problem.graph
            dec = seg_count_sorted(peel[g.csc_rows], g.csc_offsets)
        return {**state, "k": k, "degrees": deg - dec,
                "frontier": alive, "cores": cores}

    def finalize(self, state):
        return state


def run(graph: Graph, options: Options | None = None, warmup: bool = True) -> Result:
    """Role of reference ``kcore::run`` (kcore.hxx:221-244)."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    decrement_fn = None
    layout = None
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH and graph.n_edges:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.semiring import (
            bucketed_semiring_spmv_sparse,
            pull_layout,
        )

        interpret = use_interpret()
        # unit-weight pull layout: count peeled in-neighbors per vertex
        # (the SAME per-graph cache entry bfs/bc/hits/ppr use)
        layout = pull_layout(graph, unit=True, interpret=interpret)
        # size-gated tail-grid opt-in: peel waves collapse to a handful of
        # chunks over hundreds of rounds, so the smaller precompiled grids
        # pay for themselves only once the full grid is large (measured
        # +15% at s18: 2916 vs 3433 ms, results_r2c battery; still LOSES
        # at s16 with sub-block bits: 452 vs 331 ms pre-bits A/B).
        # GUNROCK_KCORE_TAIL_GRIDS overrides for A/Bs ("" = off).
        import os

        env_tg = os.environ.get("GUNROCK_KCORE_TAIL_GRIDS")
        if env_tg is not None:
            # empty tuple = explicit off (None would fall back to the
            # process-wide GUNROCK_TAIL_GRIDS default in _tail_grid_dispatch)
            tail_grids = tuple(int(t) for t in env_tg.split(",") if t.strip())
        else:
            # round-5 chip A/B at s20: ladder (2,4,8,16,32,64,256)
            # 4.996 s vs (8,64) 5.508 s vs (8,64,512) 5.422 s — active
            # chunk counts per wave sit BETWEEN the coarse tiers (one
            # peeled hub lights ~deg chunks), so a denser ladder tracks
            # them; the win is bounded (~9%) because the per-wave floor
            # is the plan + cond machinery, not grid slots.
            tail_grids = (
                (2, 4, 8, 16, 32, 64, 256)
                if graph.n_vertices >= (1 << 18) else None
            )

        def decrement_fn(peel, alive, lay):
            # doubly frontier-sparse: peel waves are tiny in most rounds
            # (source windows without a peeled vertex skip) and the alive
            # set shrinks as peeling progresses (destination windows with
            # no alive vertex skip)
            cnt = bucketed_semiring_spmv_sparse(
                lay, peel.astype(jnp.float32), peel, "plus_times",
                interpret=interpret, out_mask=alive,
                tail_grids=tail_grids, exact=True, unit=True,
            )
            return jnp.round(cnt).astype(jnp.int32)

    # Framework-skeleton driver (round 5, VERDICT #9): the BSP loop runs
    # through Enactor/Problem like bfs/sssp/pr. The enactor instance
    # (and its compiled while_loop) is cached per graph + strategy —
    # constructing a fresh one per call would retrace (~90 s over the
    # tunnel; the jitcache lesson).
    from gunrock_tpu.ops.pallas.layout import cached_layout

    strat_key = (
        None if decrement_fn is None
        else ("pallas", interpret, tail_grids)
    )
    enactor = cached_layout(
        graph.col_indices,
        lambda: KCoreEnactor(KCoreProblem(graph, layout), decrement_fn),
        ("kcore_enactor", options.load_balance, strat_key),
    )
    state, elapsed_ms = enactor.enact(warmup=warmup)
    cores = state["cores"]
    return Result(
        k_cores=cores, degeneracy=int(jnp.max(cores)),
        elapsed_ms=elapsed_ms, rounds=int(state["iteration"]),
    )
