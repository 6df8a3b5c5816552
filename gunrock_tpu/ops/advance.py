"""Advance: frontier expansion as gather + sorted segmented reduction.

The TPU-native redesign of the reference's load-balanced advance kernels
(reference include/gunrock/framework/operators/advance/advance.hxx:102-275,
block_mapped.hxx, merge_path_v2.hxx). The reference expands an input
frontier to all neighbors, applying a user lambda
``op(src, neighbor, edge, weight) -> bool`` under per-edge atomics.

Here the same computation is a pure dataflow program:

1. **gather** — read frontier activity and per-edge operands for *every*
   edge in one vectorized pass over the edge arrays (the irregular
   degree distribution is flattened away: work is O(E) and perfectly
   load-balanced by construction — the property the reference's
   merge-path kernels fight for, merge_path.hxx:9-37),
2. **map** — apply the user's pure ``edge_op(src, dst, edge, weight)``,
3. **segmented reduce** — combine per-edge values into per-vertex results
   keyed by destination (forward) or source (backward) with
   ``jax.ops.segment_{min,max,sum}`` over *sorted* segment ids. Sorted
   segments are guaranteed because forward reduction runs over the CSC
   ordering and backward over the CSR ordering.

Associative reductions replace the reference's ``atomic::min/add``
(util/math.hxx:75-136) — results are deterministic by construction.

Inside a `lax.while_loop`, this makes every BSP iteration a fixed-shape
XLA program: no host round trip per iteration (contrast the reference call
stack, SURVEY.md section 3.1).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import AdvanceDirection, LoadBalance
from gunrock_tpu.utils.limits import reduce_identity

_SEGMENT_REDUCERS = {
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
    "sum": jax.ops.segment_sum,
}


def edge_map_reduce(
    graph: Graph,
    edge_values: jax.Array,
    active: jax.Array | None,
    reduce: str = "sum",
    by: str = "dst",
    edge_order: str = "csr",
) -> jax.Array:
    """Low-level segmented combine of per-edge values into per-vertex values.

    ``edge_values``/``active`` are in CSR edge order if ``edge_order='csr'``
    or CSC slot order if ``'csc'``. ``by`` selects the reduction key.
    Inactive edges contribute the reduction identity.
    """
    reducer = _SEGMENT_REDUCERS[reduce]
    if by == "dst" and edge_order == "csr":
        # permute into CSC order so segment ids are sorted
        edge_values = edge_values[graph.csc_edge_perm]
        if active is not None:
            active = active[graph.csc_edge_perm]
        seg = graph.csc_dst
    elif by == "dst" and edge_order == "csc":
        seg = graph.csc_dst
    elif by == "src" and edge_order == "csr":
        seg = graph.edge_src
    else:
        raise ValueError(f"unsupported combination by={by} edge_order={edge_order}")

    if active is not None:
        ident = reduce_identity(edge_values.dtype, reduce)
        edge_values = jnp.where(active, edge_values, ident)
    return reducer(
        edge_values,
        seg,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )


def advance(
    graph: Graph,
    frontier: jax.Array,
    edge_op: Callable,
    reduce: str = "min",
    direction: AdvanceDirection = AdvanceDirection.FORWARD,
    load_balance: LoadBalance = LoadBalance.XLA_SEGMENT,
    edge_frontier: bool = False,
):
    """Expand a frontier along edges and reduce per vertex.

    Args:
      graph: the CSR+CSC graph.
      frontier: dense ``bool[V]`` vertex mask (or ``bool[E]`` CSR-edge mask
        when ``edge_frontier=True``).
      edge_op: pure vectorized ``edge_op(src, dst, edge_id, weight) ->
        value`` evaluated for every edge (arrays of shape [E]).
      reduce: 'min' | 'max' | 'sum'.
      direction: FORWARD reduces by destination over out-edges of frontier
        vertices; BACKWARD reduces by source over out-edges whose
        *destination* is in the frontier (pull).
      load_balance: strategy. The generic-callable form of ``edge_op``
        always runs the XLA_SEGMENT path (an arbitrary Python lambda
        cannot be staged into the Pallas kernel); declarative semiring
        advances dispatch on this flag in :func:`advance_semiring` — the
        operator-level runtime dispatch of the reference
        (advance.hxx:247-275 ``execute_runtime``).

    Returns:
      ``(reduced int/float[V], touched bool[V])`` — per-vertex reduced
      values and the mask of vertices receiving at least one active edge
      (the raw output frontier before any user filtering, matching the
      reference semantics where ``op(...)==false`` writes the invalid
      sentinel, advance/advance.hxx:17-38).
    """
    if isinstance(edge_op, str):
        raise TypeError(
            "declarative semiring advance: call advance_semiring(graph, x, "
            f"semiring={edge_op!r}, ...) — it carries the x operand and "
            "runtime-dispatches between the XLA and Pallas paths"
        )

    if direction == AdvanceDirection.FORWARD:
        # CSC slot order: sorted by destination.
        src = graph.csc_rows
        dst = graph.csc_dst
        eid = graph.csc_edge_perm
        w = graph.csc_values
        seg = dst
    elif direction == AdvanceDirection.BACKWARD:
        # CSR edge order: sorted by source. Frontier tested at destination.
        src = graph.edge_src
        dst = graph.col_indices
        eid = None  # CSR order: edge id is positional
        w = graph.values
        seg = src
    else:
        raise ValueError(f"advance does not dispatch {direction} directly")

    E = graph.n_edges
    if eid is None:
        eid = jnp.arange(E, dtype=jnp.int32)

    if edge_frontier:
        active = frontier[eid] if direction == AdvanceDirection.FORWARD else frontier
    else:
        active = (
            frontier[src]
            if direction == AdvanceDirection.FORWARD
            else frontier[dst]
        )

    values = edge_op(src, dst, eid, w)
    ident = reduce_identity(values.dtype, reduce)
    masked = jnp.where(active, values, ident)

    offsets = (
        graph.csc_offsets
        if direction == AdvanceDirection.FORWARD
        else graph.row_offsets
    )
    if reduce == "sum":
        # sorted segments: cumsum difference beats the scatter lowering
        from gunrock_tpu.ops.segment import seg_sum_sorted

        reduced = seg_sum_sorted(masked, offsets)
    else:
        reducer = _SEGMENT_REDUCERS[reduce]
        reduced = reducer(
            masked, seg, num_segments=graph.n_vertices, indices_are_sorted=True
        )
    from gunrock_tpu.ops.segment import seg_count_sorted

    touched = seg_count_sorted(active, offsets) > 0
    return reduced, touched


# Semiring combine/identities for the declarative advance form.
_SEMIRING_IDENT = {"plus_times": 0.0, "min_plus": jnp.inf, "max_times": 0.0}


def advance_semiring(
    graph: Graph,
    x: jax.Array,
    semiring: str,
    frontier: jax.Array | None = None,
    direction: AdvanceDirection = AdvanceDirection.FORWARD,
    load_balance: LoadBalance = LoadBalance.XLA_SEGMENT,
    window: int = 2048,
    chunk: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Declarative advance: per-vertex semiring reduction over edges.

    - FORWARD (push): ``y[dst] = reduce over in-edges (src,dst) with src
      active of combine(w, x[src])``
    - BACKWARD (pull): ``y[src] = reduce over out-edges (src,dst) with dst
      active of combine(w, x[dst])``

    This is the operator-level *runtime dispatch* of the reference
    (``operators/advance/advance.hxx:247-275`` ``execute_runtime``): the
    ``load_balance`` flag picks the XLA segmented-reduction path or the
    Pallas bucketed MXU kernel at call time, so every algorithm written
    against this operator inherits both strategies. Frontier masking is
    expressed through the x operand (inactive vertices carry the gather
    identity), which the semiring absorbs exactly.

    Returns the reduced ``float32[V]``; for ``min_plus`` vertices with no
    active in/out edge hold ``+inf``, for plus/max ``0``.
    """
    if semiring not in _SEMIRING_IDENT:
        raise ValueError(f"unknown semiring {semiring!r}")
    x = jnp.asarray(x, jnp.float32)
    if frontier is not None:
        gather_ident = jnp.float32(
            3.0e38 if semiring == "min_plus" else 0.0
        )
        x = jnp.where(frontier, x, gather_ident)

    if load_balance == LoadBalance.PALLAS_MERGE_PATH:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import build_bucketed_layout, cached_layout
        from gunrock_tpu.ops.pallas.semiring import _BIG, bucketed_semiring_spmv

        if interpret is None:
            interpret = use_interpret()
        pad = _BIG if semiring == "min_plus" else 0.0
        if direction == AdvanceDirection.FORWARD:
            # rows = destinations (CSC orientation of the same edges)
            import numpy as np

            layout = cached_layout(
                graph.col_indices,
                lambda: build_bucketed_layout(
                    np.asarray(graph.col_indices),
                    np.asarray(graph.edge_src),
                    np.asarray(graph.values),
                    graph.n_vertices,
                    window=window,
                    chunk=chunk,
                    pad_value=pad,
                ),
                ("pull", window, chunk, pad),
            )
        elif direction == AdvanceDirection.BACKWARD:
            import numpy as np

            layout = cached_layout(
                graph.col_indices,
                lambda: build_bucketed_layout(
                    np.asarray(graph.edge_src),
                    np.asarray(graph.col_indices),
                    np.asarray(graph.values),
                    graph.n_vertices,
                    window=window,
                    chunk=chunk,
                    pad_value=pad,
                ),
                ("push", window, chunk, pad),
            )
        else:
            raise ValueError(f"advance_semiring does not dispatch {direction}")
        if frontier is not None:
            # frontier-sparse: chunks whose source window has no active
            # vertex skip in-grid (and collapsed frontiers run a smaller
            # compiled grid — semiring._tail_grid_dispatch), so operator
            # users inherit the same sparsity the tuned algorithms use
            from gunrock_tpu.ops.pallas.semiring import (
                bucketed_semiring_spmv_sparse,
            )

            return bucketed_semiring_spmv_sparse(
                layout, x, frontier, semiring, interpret=interpret
            )
        return bucketed_semiring_spmv(layout, x, semiring, interpret=interpret)

    # XLA segmented path.
    if direction == AdvanceDirection.FORWARD:
        vals = x[graph.csc_rows]
        w = graph.csc_values
        seg = graph.csc_dst
        offsets = graph.csc_offsets
    elif direction == AdvanceDirection.BACKWARD:
        vals = x[graph.col_indices]
        w = graph.values
        seg = graph.edge_src
        offsets = graph.row_offsets
    else:
        raise ValueError(f"advance_semiring does not dispatch {direction}")

    if semiring == "min_plus":
        msg = jnp.minimum(w + vals, 3.0e38)
        reduced = jax.ops.segment_min(
            msg, seg, num_segments=graph.n_vertices, indices_are_sorted=True
        )
        # >= _BIG means "no active edge" (empty segments reduce to f32 max)
        return jnp.where(reduced >= 3.0e38, jnp.inf, reduced)
    msg = w * vals
    if semiring == "plus_times":
        from gunrock_tpu.ops.segment import seg_sum_sorted

        return seg_sum_sorted(msg, offsets)
    reduced = jax.ops.segment_max(
        msg, seg, num_segments=graph.n_vertices, indices_are_sorted=True
    )
    return jnp.maximum(reduced, 0.0)  # identity 0 for empty segments
