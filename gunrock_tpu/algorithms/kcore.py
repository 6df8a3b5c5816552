"""K-core decomposition: the core number of every vertex.

Role of reference include/gunrock/algorithms/kcore.hxx — an outer loop over
``k = 1, 2, ...`` with a nested inner peel: mark vertices of (residual)
degree <= k deleted with ``k_cores[v] = k``, decrement their neighbors'
degrees, repeat until no vertex peels at this k; converge when every
vertex is deleted (kcore.hxx:139-202). The reference's iteration count at
convergence is the graph's degeneracy.

TPU redesign: one flat ``lax.while_loop`` carrying ``(k, degrees, deleted,
k_cores)``: each step peels the current-k set via a dense mask and one
segmented sum (neighbor degree decrements); when nothing peels, k
advances. Deterministic, and the nested reference loop flattens without
host round trips.
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
    pass


@dataclasses.dataclass
class Result:
    k_cores: jax.Array  # int32[V]
    degeneracy: int
    elapsed_ms: float


def kcore_kernel(graph: Graph):
    """Pure k-core. Returns (k_cores int32[V], degeneracy)."""
    V = graph.n_vertices
    deg0 = graph.out_degrees().astype(jnp.int32)

    def cond(carry):
        k, deg, deleted, cores = carry
        return ~jnp.all(deleted)

    def body(carry):
        k, deg, deleted, cores = carry
        peel = (~deleted) & (deg <= k)
        any_peel = jnp.any(peel)
        cores = jnp.where(peel, k, cores)
        deleted = deleted | peel
        # Each deleted vertex decrements every out-neighbor's degree once
        # per connecting edge (kcore.hxx:158-166).
        from gunrock_tpu.ops.segment import seg_count_sorted

        deg = deg - seg_count_sorted(peel[graph.csc_rows], graph.csc_offsets)
        k = jnp.where(any_peel, k, k + 1)
        return k, deg, deleted, cores

    k, _, _, cores = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(1),
            deg0,
            jnp.zeros(V, dtype=bool),
            jnp.zeros(V, dtype=jnp.int32),
        ),
    )
    return cores, k


def run(graph: Graph, options: Options | None = None, warmup: bool = True) -> Result:
    """Role of reference ``kcore::run`` (kcore.hxx:221-244)."""
    del options
    fn = jax.jit(kcore_kernel)
    if warmup:
        jax.block_until_ready(fn(graph))
    t0 = time.perf_counter()
    cores, k = jax.block_until_ready(fn(graph))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(k_cores=cores, degeneracy=int(k), elapsed_ms=elapsed_ms)
