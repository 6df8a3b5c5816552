"""neighbor_reduce: segmented reduction over each vertex's neighborhood.

Role of reference include/gunrock/framework/operators/neighborreduce/
(neighborreduce.hxx:53-82 — dead in the reference since the ModernGPU
removal, but its capability is SpMV-pull and must exist, SURVEY.md 2.5).

``neighbor_reduce(G, edge_op, reduce)`` computes, for every vertex ``u``,
``reduce over out-edges (u,v)`` of ``edge_op(u, v, e, w)`` — a sorted
segmented reduction keyed by source over the CSR ordering. With
``direction='in'`` it reduces over in-edges via the CSC ordering.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import Graph
from gunrock_tpu.utils.limits import reduce_identity

_REDUCERS = {
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
    "sum": jax.ops.segment_sum,
}


def neighbor_reduce(
    graph: Graph,
    edge_op: Callable,
    reduce: str = "sum",
    direction: str = "out",
    active=None,
):
    if direction == "out":
        src, dst, w = graph.edge_src, graph.col_indices, graph.values
        eid = jnp.arange(graph.n_edges, dtype=jnp.int32)
        seg = src
    elif direction == "in":
        src, dst, w = graph.csc_rows, graph.csc_dst, graph.csc_values
        eid = graph.csc_edge_perm
        seg = dst
    else:
        raise ValueError(f"unknown direction {direction!r}")

    values = edge_op(src, dst, eid, w)
    if active is not None:
        ident = reduce_identity(values.dtype, reduce)
        values = jnp.where(active, values, ident)
    return _REDUCERS[reduce](
        values, seg, num_segments=graph.n_vertices, indices_are_sorted=True
    )
