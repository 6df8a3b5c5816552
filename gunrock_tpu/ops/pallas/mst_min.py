"""Borůvka min-cut-edge kernel: per-row MIN of static edge ranks over
CUT edges (endpoints in different components), as one bucketed pass.

Role of reference mst.hxx:130-174 (per-component atomic-min of cut-edge
weight, then of edge id among weight ties). The TPU form packs the
reference's (weight, id) lexicographic pair into a single precomputed
global RANK per undirected edge (mst._rank_tables), so the whole choice
is ONE masked min-reduce:

    y[row] = min over edges e at row of ( rank_e  if root[col_e] != root[row]
                                          else +inf )

The cut test needs BOTH endpoints' roots per edge — a per-edge random
gather pair that serialized at ~0.1 Gelem/s as XLA ops (the round-4 MST
floor: ~8 E-sized gathers/scatters per round, flat for two rounds of
VERDICTs). Here both roots ride the v4 ``tpu.dynamic_gather`` select
tree (semiring._gather_window_dyn): the col-side window is the normal
x-by-cb pipelined block, and the ROW-side window is the SAME x array
pipelined a second time with an rb index map — no manual DMA needed.
The min scatter is the one-hot form of semiring._minmax_chunk_v4 (no
MXU form exists for min).

Ranks ride as f32 (exact for rank < 2^24 — gated by the caller)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import BucketedEdges
from gunrock_tpu.ops.pallas.semiring import _BIG, _gather_window_dyn


def _make_mst_min_kernel():
    def kernel(pk_ref, xc_ref, xr_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        S = xc_ref.shape[-2]
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, _BIG)

        col2 = col_ref[0]  # [Cr, 128] window-local ids
        row2 = row_ref[0]
        val2 = val_ref[0]  # ranks (f32), _BIG on padding slots
        rc = _gather_window_dyn(xc_ref[0], col2, S)  # root[col]
        rr = _gather_window_dyn(xr_ref[0], row2, S)  # root[row]
        msg2 = jnp.where(rc != rr, val2, _BIG)
        # one-hot min scatter per (s, cr) tile (_minmax_chunk_v4 form)
        Cr = row2.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        parts = []
        for s in range(S):
            an = None
            for cr in range(Cr):
                onehot = (row2[cr][:, None] - s * 128) == lanes
                mn = jnp.min(
                    jnp.where(onehot, msg2[cr][:, None], _BIG),
                    axis=0, keepdims=True,
                )
                an = mn if an is None else jnp.minimum(an, mn)
            parts.append(an)
        acc = parts[0] if S == 1 else jnp.concatenate(parts, axis=0)
        y_ref[0] = jnp.minimum(y_ref[0], acc)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def bucketed_min_rank_cut(
    layout: BucketedEdges, roots_f: jax.Array, interpret: bool = False
) -> jax.Array:
    """y[v] = min rank over v's CUT edges (root differs), else _BIG.

    ``roots_f``: component root per vertex as f32 (exact for V < 2^24).
    The layout's values must be edge ranks (f32, _BIG padding)."""
    W, C = layout.window, layout.chunk
    S = W // 128
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    if n_chunks == 0:
        return jnp.full(V, _BIG, jnp.float32)
    x_pad = (
        jnp.full(layout.n_col_blocks * W, -1.0, jnp.float32)
        .at[:V].set(roots_f)
    )
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)
    mshape = (n_chunks, C // 128, 128)
    row2 = layout.row_local.reshape(mshape)
    col2 = layout.col_local.reshape(mshape)
    val2 = layout.values.reshape(mshape)
    pk = layout.chunk_rb * 65536 + layout.chunk_cb
    mblock = (1,) + mshape[1:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] % 65536, 0, 0)),
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)
        ),
    )
    y3 = pl.pallas_call(
        _make_mst_min_kernel(),
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_row_blocks, S, 128), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, x3, x3, row2, col2, val2)
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, _BIG)
    return y3.reshape(-1)[:V]
