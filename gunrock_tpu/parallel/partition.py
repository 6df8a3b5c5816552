"""1-D edge partitioning of a graph over a device mesh.

The TPU-native replacement for the reference's striped virtual memory
(reference include/gunrock/virtual_memory.hxx:120-206 — a single logical
array physically striped across GPUs, implemented but unused by any
algorithm). Here the stripe is semantic, not just physical: edges in CSC
order (sorted by destination) are contiguously split across chips, so each
chip owns a contiguous range of destinations' in-edges and a *local sorted
segment reduction + one ICI collective* reproduces the global reduction.

Layout per shard (all padded to equal length E_pad / n_shards):

- ``csc_rows/csc_dst/csc_values`` — pull/push advance in by-dst order
- ``edge_src/edge_dst/edge_values`` — CSR (by-src) order for by-src
  reductions (SpMV-pull, HITS hub update)
- ``*_valid`` — padding masks (padding contributes the reduction identity)

Vertex-sized state (frontier masks, distances, ranks) is **replicated**:
for power-law graphs E >> V so edge traffic dominates, and replication
turns every per-vertex combine into a single ``psum``/``pmin`` over ICI —
the all-to-all boundary exchange of vertex-cut designs degenerates to a
dense collective, which is exactly what ICI is fastest at.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.graph import Graph
from gunrock_tpu.graph.properties import GraphProperties


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "csc_rows",
        "csc_dst",
        "csc_values",
        "csc_valid",
        "edge_src",
        "edge_dst",
        "edge_values",
        "edge_valid",
    ],
    meta_fields=["n_vertices", "n_edges", "n_shards", "properties"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Edge-partitioned graph pytree; edge arrays shard on axis 0."""

    # by-destination (CSC) edge order
    csc_rows: jax.Array  # int32[E_pad]
    csc_dst: jax.Array  # int32[E_pad]
    csc_values: jax.Array  # float32[E_pad]
    csc_valid: jax.Array  # bool[E_pad]
    # by-source (CSR) edge order
    edge_src: jax.Array  # int32[E_pad]
    edge_dst: jax.Array  # int32[E_pad]
    edge_values: jax.Array  # float32[E_pad]
    edge_valid: jax.Array  # bool[E_pad]

    n_vertices: int
    n_edges: int
    n_shards: int
    properties: GraphProperties


def _pad_to(x: np.ndarray, length: int, fill) -> np.ndarray:
    out = np.full(length, fill, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def partition_graph(
    graph: Graph, n_shards: int, mesh=None, axis_name: str = "edges"
) -> PartitionedGraph:
    """Split ``graph`` into ``n_shards`` equal edge ranges (host-side).

    When ``mesh`` is given the arrays are placed with a ``NamedSharding``
    splitting axis 0 across ``axis_name`` — otherwise they stay
    single-device (useful for tests that shard later).
    """
    E = graph.n_edges
    shard_len = -(-E // n_shards)
    E_pad = shard_len * n_shards

    def host(a):
        return np.asarray(a)

    pg = PartitionedGraph(
        csc_rows=_pad_to(host(graph.csc_rows), E_pad, 0),
        csc_dst=_pad_to(host(graph.csc_dst), E_pad, 0),
        csc_values=_pad_to(host(graph.csc_values), E_pad, 0.0),
        csc_valid=_pad_to(np.ones(E, dtype=bool), E_pad, False),
        edge_src=_pad_to(host(graph.edge_src), E_pad, 0),
        edge_dst=_pad_to(host(graph.col_indices), E_pad, 0),
        edge_values=_pad_to(host(graph.values), E_pad, 0.0),
        edge_valid=_pad_to(np.ones(E, dtype=bool), E_pad, False),
        n_vertices=graph.n_vertices,
        n_edges=graph.n_edges,
        n_shards=n_shards,
        properties=graph.properties,
    )

    def dev(x):
        arr = jnp.asarray(x)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arr = jax.device_put(arr, NamedSharding(mesh, P(axis_name)))
        return arr

    return jax.tree_util.tree_map(dev, pg)
