"""SPMD operator primitives under ``shard_map``.

The distributed form of the operator layer (SURVEY.md section 2.5): each
chip reduces its local edge shard into a full vertex-sized partial result
(sorted segmented reduction — the same kernel as single-chip advance), then
one ICI collective (``psum``/``pmin``/``pmax``) combines partials. This is
the "local neighborhood aggregation overlapped with collective" recipe —
XLA schedules the overlap.

These helpers are meant to be called *inside* a ``shard_map``-decorated
function whose edge arrays carry ``PartitionSpec(axis_name)`` and whose
vertex arrays are replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gunrock_tpu.utils.limits import reduce_identity

_SEGMENT_REDUCERS = {
    "min": jax.ops.segment_min,
    "max": jax.ops.segment_max,
    "sum": jax.ops.segment_sum,
}

_COLLECTIVES = {
    "min": jax.lax.pmin,
    "max": jax.lax.pmax,
    "sum": jax.lax.psum,
}


def shard_segment_reduce(
    values: jax.Array,
    seg: jax.Array,
    valid: jax.Array,
    n_vertices: int,
    reduce: str,
    axis_name: str,
) -> jax.Array:
    """Local sorted segment reduction + ICI combine -> replicated [V]."""
    ident = reduce_identity(values.dtype, reduce)
    masked = jnp.where(valid, values, ident)
    local = _SEGMENT_REDUCERS[reduce](
        masked, seg, num_segments=n_vertices, indices_are_sorted=True
    )
    return _COLLECTIVES[reduce](local, axis_name)


def shard_pull_advance(
    pg,
    frontier: jax.Array,
    edge_op,
    reduce: str,
    axis_name: str,
):
    """Distributed forward advance: expand frontier along its out-edges,
    reduce per destination. ``pg`` is the *local shard view* of a
    ``PartitionedGraph`` (CSC-order arrays). Returns ``(reduced[V],
    touched[V])``, both replicated.
    """
    src, dst, w, valid = pg.csc_rows, pg.csc_dst, pg.csc_values, pg.csc_valid
    active = frontier[src] & valid
    values = edge_op(src, dst, w)
    reduced = shard_segment_reduce(
        values, dst, active, pg.n_vertices, reduce, axis_name
    )
    touched = (
        shard_segment_reduce(
            active.astype(jnp.int32), dst, active, pg.n_vertices, "max", axis_name
        )
        > 0
    )
    return reduced, touched
