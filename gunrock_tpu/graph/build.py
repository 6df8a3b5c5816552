"""Graph builder: host formats -> device-resident multi-view Graph.

Role of the reference's 7 ``graph::build`` overloads (reference
include/gunrock/graph/build.hxx:29-166, graph/detail/build.hxx:18-180),
re-designed for XLA: both CSR and CSC views (plus the expanded COO
segment-id arrays) are computed on the host once, padded/typed, and shipped
to the device as immutable `jax.Array`s.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gunrock_tpu.formats import Coo, Csr, Csc, coo_to_csr, csr_to_csc
from gunrock_tpu.formats.formats import offsets_to_indices
from gunrock_tpu.graph.graph import Graph
from gunrock_tpu.graph.properties import GraphProperties


def build_graph_from_arrays(
    n_vertices: int,
    row_offsets: np.ndarray,
    col_indices: np.ndarray,
    values: np.ndarray | None = None,
    properties: GraphProperties | None = None,
    device=None,
) -> Graph:
    """Build from raw CSR arrays (sorted or unsorted rows)."""
    nnz = int(col_indices.shape[0])
    if values is None:
        values = np.ones(nnz, dtype=np.float32)
    csr = Csr(
        n_rows=n_vertices,
        n_cols=n_vertices,
        row_offsets=np.asarray(row_offsets, dtype=np.int32),
        col_indices=np.asarray(col_indices, dtype=np.int32),
        values=np.asarray(values, dtype=np.float32),
    )
    return build_graph(csr, properties=properties, device=device)


def build_graph(
    fmt: Csr | Coo | Csc,
    properties: GraphProperties | None = None,
    device=None,
) -> Graph:
    """Build a device Graph from any host format.

    Equivalent in role to ``graph::build(properties, csr)`` etc.
    (reference graph/build.hxx:33-166). Rows are re-sorted by destination
    so the CSR view supports binary search / sorted intersection.
    """
    if properties is None:
        properties = GraphProperties()

    if isinstance(fmt, Coo):
        csr = coo_to_csr(fmt)
    elif isinstance(fmt, Csc):
        # A CSC of G is the CSR of G^T; rebuild through COO to get G's CSR.
        coo = Coo(
            n_rows=fmt.n_rows,
            n_cols=fmt.n_cols,
            row_indices=fmt.row_indices,
            col_indices=offsets_to_indices(fmt.col_offsets),
            values=fmt.values,
        )
        csr = coo_to_csr(coo)
    elif isinstance(fmt, Csr):
        # Normalize: ensure rows sorted by destination (cheap no-op pass if
        # already sorted, which coo_to_csr guarantees).
        coo = Coo(
            n_rows=fmt.n_rows,
            n_cols=fmt.n_cols,
            row_indices=offsets_to_indices(fmt.row_offsets),
            col_indices=fmt.col_indices,
            values=fmt.values,
        )
        csr = coo_to_csr(coo)
    else:
        raise TypeError(f"cannot build a graph from {type(fmt)!r}")

    n = max(csr.n_rows, csr.n_cols)
    if csr.n_rows != n:
        # Square up: pad offsets for trailing empty rows.
        pad = np.full(n - csr.n_rows, csr.row_offsets[-1], dtype=csr.row_offsets.dtype)
        csr = Csr(
            n_rows=n,
            n_cols=n,
            row_offsets=np.concatenate([csr.row_offsets, pad]),
            col_indices=csr.col_indices,
            values=csr.values,
        )

    edge_src = offsets_to_indices(csr.row_offsets)

    if properties.symmetric:
        # CSC view aliases CSR storage: for a symmetric edge set the
        # transpose has identical structure. Mirrors the reference's
        # views-share-data design (graph/graph.hxx:187-195) and halves HBM.
        csc_offsets = csr.row_offsets
        csc_rows = csr.col_indices
        csc_dst = edge_src
        csc_values = csr.values
        csc_edge_perm = np.arange(csr.nnz, dtype=np.int32)
    else:
        csc, perm = csr_to_csc(csr)
        csc_offsets = csc.col_offsets
        csc_rows = csc.row_indices
        csc_dst = offsets_to_indices(csc.col_offsets)
        csc_values = csc.values
        csc_edge_perm = perm

    def dev(x, dtype):
        arr = jnp.asarray(np.asarray(x, dtype=dtype))
        if device is not None:
            import jax

            arr = jax.device_put(arr, device)
        return arr

    g = Graph(
        row_offsets=dev(csr.row_offsets, np.int32),
        col_indices=dev(csr.col_indices, np.int32),
        values=dev(csr.values, np.float32),
        edge_src=dev(edge_src, np.int32),
        csc_offsets=dev(csc_offsets, np.int32),
        csc_rows=dev(csc_rows, np.int32),
        csc_dst=dev(csc_dst, np.int32),
        csc_values=dev(csc_values, np.float32),
        csc_edge_perm=dev(csc_edge_perm, np.int32),
        n_vertices=int(n),
        n_edges=int(csr.nnz),
        properties=properties,
    )
    # The host copies existed right here — register them so layout
    # builders and CPU oracles never pay a device->host read over the
    # tunnel (graph/hostcache.py).
    from gunrock_tpu.graph import hostcache

    hostcache.register(
        g,
        row_offsets=np.asarray(csr.row_offsets, np.int32),
        col_indices=np.asarray(csr.col_indices, np.int32),
        values=np.asarray(csr.values, np.float32),
        edge_src=np.asarray(edge_src, np.int32),
        csc_offsets=np.asarray(csc_offsets, np.int32),
        csc_rows=np.asarray(csc_rows, np.int32),
        csc_dst=np.asarray(csc_dst, np.int32),
    )
    return g
