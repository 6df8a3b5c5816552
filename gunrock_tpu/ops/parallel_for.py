"""parallel_for: elementwise application over frontiers, vertices, edges.

Role of reference include/gunrock/framework/operators/for/for.hxx — a
``thrust::for_each`` over frontier elements (skipping invalids) or over all
graph vertices / edges / weights. Under XLA, side-effect-free vectorized
application *is* the for_each; functions return updated arrays instead of
mutating captured pointers.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gunrock_tpu.graph import Graph
from gunrock_tpu.utils.limits import is_valid


def for_each_vertex(graph: Graph, fn: Callable):
    """Apply ``fn(vertex_ids)`` over all vertices (for.hxx:54-66)."""
    v = jnp.arange(graph.n_vertices, dtype=jnp.int32)
    return fn(v)


def for_each_edge(graph: Graph, fn: Callable):
    """Apply ``fn(src, dst, edge_id, weight)`` over all edges
    (for.hxx:86-105 — the PageRank scatter loop shape)."""
    e = jnp.arange(graph.n_edges, dtype=jnp.int32)
    return fn(graph.edge_src, graph.col_indices, e, graph.values)


def for_each_in_frontier_mask(mask, fn: Callable):
    """Apply ``fn(vertex_ids, active_mask)`` over a dense frontier."""
    v = jnp.arange(mask.shape[0], dtype=jnp.int32)
    return fn(v, mask)


def for_each_in_queue(data, count, fn: Callable):
    """Apply ``fn(items, live_mask)`` over a padded queue frontier,
    masking invalid/padded slots (for.hxx:26-40)."""
    live = (jnp.arange(data.shape[0], dtype=count.dtype) < count) & is_valid(data)
    return fn(data, live)
