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
    """Pure HITS to convergence. Returns (auth, hub, iterations)."""
    V = graph.n_vertices
    auth0 = jnp.ones(V, dtype=jnp.float32)
    hub0 = jnp.ones(V, dtype=jnp.float32)

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


def run(
    graph: Graph,
    max_iterations: int = 50,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``hits::run`` (hits.hxx:215-240)."""
    del options
    fn = jax.jit(lambda g: hits_kernel(g, max_iterations))
    if warmup:
        jax.block_until_ready(fn(graph))
    t0 = time.perf_counter()
    auth, hub, it = jax.block_until_ready(fn(graph))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(auth=auth, hub=hub, iterations=int(it), elapsed_ms=elapsed_ms)
