"""Device-resident multi-view graph.

The TPU-native analog of the reference's variadic multi-view
``graph::graph_t`` (reference include/gunrock/graph/graph.hxx:58-456,
graph/csr.hxx:37-237): one immutable pytree carrying CSR *and* CSC views of
the same edge set as `jax.Array`s, usable inside `jit`/`while_loop`/`vmap`.

Design notes (idiomatic XLA, not a translation):

- Both views are materialized at build time on the host (the reference
  builds CSC lazily from CSR on device). CSC is what makes *push* advance a
  sorted segmented reduction keyed by destination — the deterministic
  replacement for the reference's per-edge atomics.
- ``edge_src`` / ``csc_dst`` are the expanded segment-id arrays (the COO
  view, reference graph/conversions/convert.hxx:21-47 kept permanently):
  segment reductions need them and they double as COO row/col indices.
- For symmetric graphs the CSC arrays alias the CSR arrays (zero extra HBM),
  like the reference sharing underlying data between views
  (graph/graph.hxx:187-195 "does not own data").
- Accessors mirror the reference graph API: ``get_number_of_neighbors``,
  ``get_starting_edge``, ``get_destination_vertex``, ``get_source_vertex``
  (binary search over offsets, reference graph/csr.hxx:66-81),
  ``get_edge(u, v)`` (binary search within a row, graph/csr.hxx:99-104).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gunrock_tpu.graph.properties import GraphProperties


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "row_offsets",
        "col_indices",
        "values",
        "edge_src",
        "csc_offsets",
        "csc_rows",
        "csc_dst",
        "csc_values",
        "csc_edge_perm",
    ],
    meta_fields=["n_vertices", "n_edges", "properties"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Immutable CSR+CSC graph pytree.

    CSR edge ``e``: ``edge_src[e] -> col_indices[e]`` with weight
    ``values[e]``; edges are sorted by (src, dst).
    CSC slot ``k``: ``csc_rows[k] -> csc_dst[k]`` with weight
    ``csc_values[k]``; slots are sorted by (dst, src) and
    ``csc_edge_perm[k]`` is the CSR edge id stored at slot ``k``.
    """

    # --- CSR view ---
    row_offsets: jax.Array  # int32[V+1]
    col_indices: jax.Array  # int32[E]
    values: jax.Array  # float32[E]
    edge_src: jax.Array  # int32[E] — sorted segment ids (COO rows)

    # --- CSC view ---
    csc_offsets: jax.Array  # int32[V+1]
    csc_rows: jax.Array  # int32[E] — source of each CSC slot (COO cols sorted by dst)
    csc_dst: jax.Array  # int32[E] — sorted segment ids
    csc_values: jax.Array  # float32[E]
    csc_edge_perm: jax.Array  # int32[E] — CSR edge id at each CSC slot

    # --- static metadata ---
    n_vertices: int
    n_edges: int
    properties: GraphProperties

    # ------------------------------------------------------------------
    # Vertex/edge accessors (reference graph/csr.hxx:56-113)
    # ------------------------------------------------------------------

    def get_number_of_vertices(self) -> int:
        return self.n_vertices

    def get_number_of_edges(self) -> int:
        return self.n_edges

    def get_number_of_neighbors(self, v) -> jax.Array:
        return self.row_offsets[v + 1] - self.row_offsets[v]

    def get_in_degree(self, v) -> jax.Array:
        return self.csc_offsets[v + 1] - self.csc_offsets[v]

    def get_starting_edge(self, v) -> jax.Array:
        return self.row_offsets[v]

    def get_destination_vertex(self, e) -> jax.Array:
        return self.col_indices[e]

    def get_source_vertex(self, e) -> jax.Array:
        """Binary search over row offsets (reference graph/csr.hxx:72-81).

        ``edge_src`` already materializes this, but the accessor is kept for
        API parity and for edge ids produced arithmetically.
        """
        return (
            jnp.searchsorted(self.row_offsets, e, side="right").astype(jnp.int32)
            - 1
        )

    def get_edge_weight(self, e) -> jax.Array:
        return self.values[e]

    def get_edge(self, u, v) -> jax.Array:
        """Edge id of (u, v) or -1 (reference graph/csr.hxx:99-104).

        Row segments are sorted by destination, so this is a binary search
        within ``col_indices[row_offsets[u]:row_offsets[u+1]]``.
        """
        start = self.row_offsets[u]
        end = self.row_offsets[u + 1]
        # Bounded binary search within the row segment.
        lo = start
        hi = end

        def body(_, state):
            lo, hi = state
            mid = (lo + hi) // 2
            go_right = self.col_indices[mid] < v
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
            return lo, hi

        # V <= 2^31 so 32 iterations always suffice; fixed trip count keeps
        # this jit/vmap-friendly.
        lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
        found = (lo < end) & (self.col_indices[jnp.minimum(lo, self.n_edges - 1)] == v)
        return jnp.where(found, lo.astype(jnp.int32), jnp.int32(-1))

    def get_intersection_count(self, u, v) -> jax.Array:
        """Size of N(u) ∩ N(v) over sorted adjacency rows (role of
        reference ``get_intersection_count``, graph/csr.hxx:116-173 — the
        TC building block). Jit/vmap-safe: iterates the smaller row,
        binary-searching the larger."""
        du = self.get_number_of_neighbors(u)
        dv = self.get_number_of_neighbors(v)
        small = jnp.where(du <= dv, u, v)
        big = jnp.where(du <= dv, v, u)
        s_start = self.row_offsets[small]
        s_end = self.row_offsets[small + 1]
        b_start = self.row_offsets[big]
        b_end = self.row_offsets[big + 1]

        def body(state):
            e, count = state
            y = self.col_indices[e]
            lo, hi = b_start, b_end

            def sstep(_, lh):
                lo, hi = lh
                active = lo < hi
                mid = (lo + hi) // 2
                go_right = self.col_indices[jnp.minimum(mid, self.n_edges - 1)] < y
                nlo = jnp.where(go_right, mid + 1, lo)
                nhi = jnp.where(go_right, hi, mid)
                return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

            lo, hi = jax.lax.fori_loop(0, 32, sstep, (lo, hi))
            found = (lo < b_end) & (
                self.col_indices[jnp.minimum(lo, self.n_edges - 1)] == y
            )
            return e + 1, count + found.astype(jnp.int32)

        _, count = jax.lax.while_loop(
            lambda s: s[0] < s_end, body, (s_start, jnp.int32(0))
        )
        return count

    def intersect_neighbors(self, u, v, on_intersection, init):
        """Visitor form of :meth:`get_intersection_count` (role of the
        reference's ``on_intersection`` lambda, graph/csr.hxx:116-173):
        folds the pure function ``on_intersection(acc, vertex) -> acc``
        over every vertex of N(u) ∩ N(v), starting from ``init``.
        Jit-safe; the per-triangle side effects of the reference become a
        functional reduction."""
        du = self.get_number_of_neighbors(u)
        dv = self.get_number_of_neighbors(v)
        small = jnp.where(du <= dv, u, v)
        big = jnp.where(du <= dv, v, u)
        s_start = self.row_offsets[small]
        s_end = self.row_offsets[small + 1]
        b_start = self.row_offsets[big]
        b_end = self.row_offsets[big + 1]

        def body(state):
            e, acc = state
            y = self.col_indices[e]
            lo, hi = b_start, b_end

            def sstep(_, lh):
                lo, hi = lh
                active = lo < hi
                mid = (lo + hi) // 2
                go_right = self.col_indices[jnp.minimum(mid, self.n_edges - 1)] < y
                nlo = jnp.where(go_right, mid + 1, lo)
                nhi = jnp.where(go_right, hi, mid)
                return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

            lo, hi = jax.lax.fori_loop(0, 32, sstep, (lo, hi))
            found = (lo < b_end) & (
                self.col_indices[jnp.minimum(lo, self.n_edges - 1)] == y
            )
            new_acc = on_intersection(acc, y)
            acc = jax.tree_util.tree_map(
                lambda n, o: jnp.where(found, n, o), new_acc, acc
            )
            return e + 1, acc

        _, acc = jax.lax.while_loop(
            lambda s: s[0] < s_end, body, (s_start, init)
        )
        return acc

    # ------------------------------------------------------------------
    # Degree vectors & statistics (reference graph/graph.hxx:349-439)
    # ------------------------------------------------------------------

    def out_degrees(self) -> jax.Array:
        return jnp.diff(self.row_offsets)

    def in_degrees(self) -> jax.Array:
        return jnp.diff(self.csc_offsets)

    def get_average_degree(self) -> jax.Array:
        """Reference graph/graph.hxx:349-361."""
        return jnp.mean(self.out_degrees().astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32))

    def get_degree_standard_deviation(self) -> jax.Array:
        """Reference graph/graph.hxx:369-385."""
        d = self.out_degrees().astype(jnp.float32)
        return jnp.sqrt(jnp.mean((d - jnp.mean(d)) ** 2))

    def build_degree_histogram(self) -> jax.Array:
        """Log-scale degree histogram (reference graph/graph.hxx:393-439).

        Bin ``i`` counts vertices with degree in [2^(i-1), 2^i); bin 0 is
        degree 0. 33 bins cover the int32 range.
        """
        d = self.out_degrees()
        bins = jnp.where(d > 0, jnp.ceil(jnp.log2(d.astype(jnp.float32) + 1)), 0)
        bins = bins.astype(jnp.int32)
        return jnp.zeros(33, dtype=jnp.int32).at[bins].add(1)
