"""Degree-sorted vertex relabeling (hub clustering).

No reference counterpart — this exists because of how the TPU kernels
work: the bucketed windowed one-hot advance (ops/pallas/layout.py) pays
per CHUNK, and a power-law graph under a random vertex permutation (the
Graph500 R-MAT convention) spreads its edges uniformly over the
(V/W)^2 bucket grid — at scale 20 every bucket pair is occupied at ~25%
chunk fill (measured frag 4.17). Relabeling vertices by descending
(in+out) degree concentrates edges into hub blocks: dense buckets fill
their chunks, tail x tail buckets become empty and produce no chunks at
all (measured frag 1.96 at scale 20, W=2048 — a 2.1x cut in kernel
lane-ops/edge).

Usage: relabel once, run the whole algorithm in relabeled space, map
results back with one gather:

    rg, ro = degree_sort(graph)
    dist2, it = bfs_kernel_do(rg, int(ro.rank[src]), layout=...)
    dist = dist2[ro.rank]          # dist[v] = dist2[rank[v]]

Per-vertex outputs index by ``rank``; per-vertex inputs (e.g. an x
vector for SpMV) pre-permute with ``x[ro.order]``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gunrock_tpu.formats import Coo
from gunrock_tpu.graph import hostcache
from gunrock_tpu.graph.build import build_graph
from gunrock_tpu.graph.graph import Graph


@dataclasses.dataclass(frozen=True)
class Reordering:
    order: np.ndarray  # int32[V] — order[new_id] = old_id (hubs first)
    rank: np.ndarray  # int32[V] — rank[old_id] = new_id


def degree_sort(graph: Graph) -> tuple[Graph, Reordering]:
    """Relabel vertices by descending (in + out) degree.

    Returns ``(relabeled_graph, reordering)``. The relabeled graph has
    identical structure/weights up to the vertex permutation; properties
    carry over (a symmetric graph stays symmetric)."""
    offs = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    vals = hostcache.host(graph, "values")
    src = hostcache.host(graph, "edge_src")
    V = graph.n_vertices

    out_deg = np.diff(offs)
    in_deg = np.bincount(cols, minlength=V)
    order = np.argsort(-(out_deg + in_deg), kind="stable").astype(np.int32)
    rank = np.empty(V, np.int32)
    rank[order] = np.arange(V, dtype=np.int32)

    # build_graph counting-sorts a COO into canonical CSR (rows grouped,
    # sorted by destination) — no pre-sort needed here
    g2 = build_graph(
        Coo(
            n_rows=V,
            n_cols=V,
            row_indices=rank[src],
            col_indices=rank[cols],
            values=vals,
        ),
        properties=dataclasses.replace(graph.properties, hub_ordered=True),
    )
    return g2, Reordering(order=order, rank=rank)


def rcm_sort(graph: Graph) -> tuple[Graph, Reordering]:
    """Reverse-Cuthill-McKee relabeling: bandwidth-minimizing BFS-level
    ordering. The locality counterpart to :func:`degree_sort` — built
    for the Gauss-Seidel sweep solver (experimental/async_sweep.py),
    whose within-sweep freshness only propagates along MONOTONE id
    paths: RCM makes shortest paths nearly monotone on meshes/roads
    (delaunay2k: 19 -> 7 BFS sweeps measured). Same relabel/map-back
    contract as degree_sort."""
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    offs = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    vals = hostcache.host(graph, "values")
    src = hostcache.host(graph, "edge_src")
    V = graph.n_vertices
    A = sp.csr_matrix(
        (np.ones(len(cols), np.float32), cols, offs), shape=(V, V)
    )
    order = np.asarray(
        csg.reverse_cuthill_mckee(A, symmetric_mode=graph.properties.symmetric),
        np.int32,
    )
    rank = np.empty(V, np.int32)
    rank[order] = np.arange(V, dtype=np.int32)
    g2 = build_graph(
        Coo(n_rows=V, n_cols=V, row_indices=rank[src],
            col_indices=rank[cols], values=vals),
        properties=graph.properties,
    )
    return g2, Reordering(order=order, rank=rank)
