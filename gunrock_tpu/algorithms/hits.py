"""HITS: hub and authority scores.

Role of reference include/gunrock/algorithms/hits.hxx — per iteration (all
from the *current* buffers, hits.hxx:138-150):

    hub_next[src]  = sum over out-edges (src,nbr) of auth_curr[nbr]
    auth_next[nbr] = sum over out-edges (src,nbr) of hub_curr[src]

then L2-normalize both (hits.hxx:153-169) and swap. Converge at
``max_iterations`` or when either vector reaches a fixpoint
(hits.hxx:178-192).

TPU redesign: the two atomic accumulations are one by-src segment-sum
(CSR order) and one by-dst segment-sum (CSC order); the loop is a
``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from gunrock_tpu.framework.enactor import Enactor
from gunrock_tpu.framework.problem import Problem
from gunrock_tpu.graph import hostcache

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Param:
    max_iterations: int = 50


@dataclasses.dataclass
class Result:
    auth: jax.Array  # float32[V]
    hub: jax.Array  # float32[V]
    iterations: int
    elapsed_ms: float


def _l2_normalize(x):
    s = jnp.sum(x * x)
    return jnp.where(s > 0, x / jnp.sqrt(s), x)


def hits_step(graph: Graph, auth, hub):
    """One HITS iteration (pure). Returns (auth_next, hub_next)."""
    from gunrock_tpu.ops.segment import seg_sum_sorted

    hub_next = seg_sum_sorted(auth[graph.col_indices], graph.row_offsets)
    auth_next = seg_sum_sorted(hub[graph.csc_rows], graph.csc_offsets)
    return _l2_normalize(auth_next), _l2_normalize(hub_next)


def hits_kernel(graph: Graph, max_iterations: int = 50):
    """Pure HITS to convergence. Returns (auth, hub, iterations).

    On symmetric storage A = A^T with equal starts, hub and auth stay
    equal forever — one segment-sum per iteration (see
    hits_kernel_pallas's symmetric path for the argument)."""
    V = graph.n_vertices
    auth0 = jnp.ones(V, dtype=jnp.float32)
    hub0 = jnp.ones(V, dtype=jnp.float32)

    if graph.properties.symmetric:
        from gunrock_tpu.ops.segment import seg_sum_sorted

        def cond1(carry):
            it, auth, done = carry
            return (~done) & (it < max_iterations)

        def body1(carry):
            it, auth, _ = carry
            auth_n = _l2_normalize(
                seg_sum_sorted(auth[graph.csc_rows], graph.csc_offsets)
            )
            done = jnp.all(auth_n == auth)
            return it + 1, auth_n, done

        it, auth, _ = jax.lax.while_loop(
            cond1, body1, (jnp.int32(0), auth0, jnp.bool_(False))
        )
        return auth, auth, it

    def cond(carry):
        it, auth, hub, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        it, auth, hub, _ = carry
        auth_n, hub_n = hits_step(graph, auth, hub)
        # Fixpoint test mirrors the reference's thrust::equal
        # (hits.hxx:182-188).
        done = jnp.all(auth_n == auth) | jnp.all(hub_n == hub)
        return it + 1, auth_n, hub_n, done

    it, auth, hub, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), auth0, hub0, jnp.bool_(False))
    )
    return auth, hub, it


def hits_kernel_pallas(
    graph: Graph,
    max_iterations: int = 50,
    push_layout=None,
    pull_layout=None,
    interpret: bool | None = None,
    symmetric: bool = False,
):
    """HITS with the plus-times Pallas semiring: both accumulations are
    bucketed windowed-one-hot sums over unit-weight layouts (HITS sums
    raw scores; edge weights are not used, hits.hxx:138-150)."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv

    V = graph.n_vertices
    if interpret is None:
        interpret = use_interpret()
    if push_layout is None or pull_layout is None:
        ones = np.ones(graph.n_edges, np.float32)
        push_layout = build_auto_layout(
            hostcache.host(graph, "edge_src"), hostcache.host(graph, "col_indices"), ones,
            V, interpret=interpret,
        )
        pull_layout = build_auto_layout(
            hostcache.host(graph, "col_indices"), hostcache.host(graph, "edge_src"), ones,
            V, interpret=interpret,
        )
    auth0 = jnp.ones(V, dtype=jnp.float32)
    hub0 = jnp.ones(V, dtype=jnp.float32)

    if symmetric:
        # A = A^T and auth0 == hub0 make the two sequences IDENTICAL
        # (hub_{t+1} = A auth_t, auth_{t+1} = A^T hub_t = A hub_t;
        # equal starts stay equal forever) — one pass per iteration,
        # exact parity with the two-pass form.
        def cond(carry):
            it, auth, done = carry
            return (~done) & (it < max_iterations)

        def body(carry):
            it, auth, _ = carry
            auth_n = _l2_normalize(
                bucketed_semiring_spmv(pull_layout, auth, "plus_times",
                                       interpret=interpret, unit=True)
            )
            done = jnp.all(auth_n == auth)
            return it + 1, auth_n, done

        it, auth, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), auth0, jnp.bool_(False))
        )
        return auth, auth, it

    # directed: ONE fused sweep computes both Jacobi accumulations
    # (ops/pallas/hits_fused.py) when the col side fits a VMEM-resident
    # whole-array block; otherwise the classic two passes.
    from gunrock_tpu.ops.pallas.hits_fused import hits_fused_pass
    from gunrock_tpu.ops.pallas.layout import BucketedEdges

    # fused needs an SMEM-resident layout (no paged variant yet) and a
    # VMEM-resident whole-array col accumulator (V * 4 B)
    fused = V <= (1 << 22) and isinstance(push_layout, BucketedEdges)

    def cond(carry):
        it, auth, hub, done = carry
        return (~done) & (it < max_iterations)

    def body(carry):
        it, auth, hub, _ = carry
        if fused:
            hub_raw, auth_raw = hits_fused_pass(
                push_layout, auth, hub, interpret=interpret
            )
            hub_n = _l2_normalize(hub_raw)
            auth_n = _l2_normalize(auth_raw)
        else:
            hub_n = _l2_normalize(
                bucketed_semiring_spmv(push_layout, auth, "plus_times",
                                       interpret=interpret, unit=True)
            )
            auth_n = _l2_normalize(
                bucketed_semiring_spmv(pull_layout, hub, "plus_times",
                                       interpret=interpret, unit=True)
            )
        done = jnp.all(auth_n == auth) | jnp.all(hub_n == hub)
        return it + 1, auth_n, hub_n, done

    it, auth, hub, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), auth0, hub0, jnp.bool_(False))
    )
    return auth, hub, it


class HitsProblem(Problem):
    """Role of reference hits problem_t (hits.hxx:54-135): auth/hub
    buffers + the (optional) Pallas layouts, which ride INSIDE the state
    pytree so they stay jit arguments (a closure would bake them into
    the HLO — the round-2 HTTP-413 trap)."""

    def __init__(self, graph: Graph, push_layout=None, pull_layout=None):
        super().__init__(graph)
        self.push_layout = push_layout
        self.pull_layout = pull_layout

    def reset(self):
        V = self.graph.n_vertices
        return {
            "auth": jnp.ones(V, jnp.float32),
            "hub": jnp.ones(V, jnp.float32),
            "done": jnp.bool_(False),
            "push": self.push_layout,
            "pull": self.pull_layout,
        }


class HitsEnactor(Enactor):
    """hits.hxx:138-192 on the framework skeleton: loop = both Jacobi
    accumulations (fused single-sweep Pallas kernel / symmetric
    single-pass / XLA segment sums — resolved at construction) +
    L2 normalization; converged at either vector's fixpoint."""

    def __init__(self, problem, max_iterations: int, mode: str,
                 interpret: bool = False):
        super().__init__(problem, max_iterations=max_iterations)
        self.mode = mode  # "fused" | "two_pass" | "symmetric" | "xla"
        self.interpret = interpret

    def prepare_frontier(self):
        return self.problem.reset()

    def is_converged(self, state):
        return state["done"]

    def loop(self, state):
        auth, hub = state["auth"], state["hub"]
        if self.mode == "xla":
            auth_n, hub_n = hits_step(self.problem.graph, auth, hub)
        elif self.mode == "symmetric":
            from gunrock_tpu.ops.pallas.semiring import (
                bucketed_semiring_spmv,
            )

            auth_n = _l2_normalize(
                bucketed_semiring_spmv(
                    state["pull"], auth, "plus_times",
                    interpret=self.interpret, unit=True,
                )
            )
            hub_n = auth_n
        elif self.mode == "fused":
            from gunrock_tpu.ops.pallas.hits_fused import hits_fused_pass

            hub_raw, auth_raw = hits_fused_pass(
                state["push"], auth, hub, interpret=self.interpret
            )
            hub_n = _l2_normalize(hub_raw)
            auth_n = _l2_normalize(auth_raw)
        else:  # two_pass (paged layouts / huge V)
            from gunrock_tpu.ops.pallas.semiring import (
                bucketed_semiring_spmv,
            )

            hub_n = _l2_normalize(
                bucketed_semiring_spmv(
                    state["push"], auth, "plus_times",
                    interpret=self.interpret, unit=True,
                )
            )
            auth_n = _l2_normalize(
                bucketed_semiring_spmv(
                    state["pull"], hub, "plus_times",
                    interpret=self.interpret, unit=True,
                )
            )
        done = jnp.all(auth_n == auth) | jnp.all(hub_n == hub)
        return {**state, "auth": auth_n, "hub": hub_n, "done": done}


def run(
    graph: Graph,
    max_iterations: int = 50,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``hits::run`` (hits.hxx:215-240), driven
    through the framework Enactor/Problem skeleton (VERDICT r4 #9)."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    from gunrock_tpu.ops.pallas.layout import cached_layout

    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import (
            BucketedEdges, dense_window_chunk)
        from gunrock_tpu.ops.pallas.semiring import pull_layout, push_layout

        interpret = use_interpret()
        # HITS is dense-only: bigger-chunk layouts win (see
        # layout.dense_window_chunk; BASELINE round-4 chunk sweep).
        dwc = dense_window_chunk(graph.n_vertices, interpret)
        w, c = dwc if dwc else (None, None)
        if graph.properties.symmetric:
            # A = A^T: one pass per iteration over ONE layout — building
            # the (structurally identical) push layout too doubled the
            # HBM footprint and OOMed s22 (134M-edge layouts are ~2 GB
            # each)
            mode = "symmetric"
            ps_ = None
            pl_ = pull_layout(graph, unit=True, interpret=interpret,
                              window=w, chunk=c)
        else:
            ps_ = push_layout(graph, unit=True, interpret=interpret,
                              window=w, chunk=c)
            if (
                graph.n_vertices <= (1 << 22)
                and isinstance(ps_, BucketedEdges)
            ):
                mode = "fused"
                pl_ = None  # the fused sweep reads only the push layout
            else:
                mode = "two_pass"
                pl_ = pull_layout(graph, unit=True, interpret=interpret,
                                  window=w, chunk=c)
        key = ("hits_enactor", max_iterations, interpret, mode)
    else:
        ps_ = pl_ = None
        interpret = False
        mode = "xla"
        key = ("hits_enactor", max_iterations, mode)

    # enactor (and its compiled while_loop) cached per graph + config —
    # a fresh instance per call would retrace (~90 s over the tunnel)
    enactor = cached_layout(
        graph.col_indices,
        lambda: HitsEnactor(
            HitsProblem(graph, ps_, pl_), max_iterations, mode,
            interpret,
        ),
        key,
    )
    state, elapsed_ms = enactor.enact(warmup=warmup)
    return Result(
        auth=state["auth"], hub=state["hub"],
        iterations=int(state["iteration"]), elapsed_ms=elapsed_ms,
    )
