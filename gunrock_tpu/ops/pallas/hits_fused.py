"""Fused HITS pass: BOTH accumulations in one edge sweep.

Role of reference hits.hxx:138-150 — per iteration

    hub_next[src]  = sum over edges (src, nbr) of auth[nbr]
    auth_next[nbr] = sum over edges (src, nbr) of hub[src]

Both sums are Jacobi (read the previous iteration's vectors — exactly
the framework's two-pass form), so one sweep over the PUSH layout can
produce both: per chunk, gather auth over the col window and scatter by
row into the usual rb-keyed output; gather hub over the ROW window
(same dual-window trick as ops/pallas/mst_min.py) and scatter by col
into a WHOLE-ARRAY output block with a constant index map — Pallas
keeps that block VMEM-resident across the entire grid (V*4 bytes; the
caller gates V), so the transpose-side accumulation never round-trips
HBM. One metadata stream + one grid traversal instead of two passes:
the dense pass is grid-step- and scatter-bound (round-5 measurement:
the values stream is free), so fusing halves exactly the expensive
parts that are per-sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import BucketedEdges
from gunrock_tpu.ops.pallas.semiring import (
    _gather_window_dyn,
    _scatter_window_pure,
)


def _make_hits_kernel(S: int, mxu: bool):
    def kernel(pk_ref, auth_ref, hub_ref, row_ref, col_ref, yhub_ref,
               yauth_ref):
        i = pl.program_id(0)
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            yhub_ref[...] = jnp.zeros_like(yhub_ref)

        @pl.when(i == 0)
        def _():
            yauth_ref[...] = jnp.zeros_like(yauth_ref)

        row2 = row_ref[0]
        col2 = col_ref[0]
        # hub side: gather auth over the col window, scatter by row
        xg_a = _gather_window_dyn(auth_ref[0], col2, S)
        yhub_ref[0] = yhub_ref[0] + _scatter_window_pure(
            row2, xg_a, "plus_times", S, mxu
        )
        # auth side: gather hub over the ROW window, scatter by col into
        # the VMEM-resident whole-array accumulator. Pad slots carry the
        # row sentinel (= W) but scatter by their COL key (0), so unlike
        # every row-keyed kernel the sentinel does not drop them — mask
        # explicitly (also covers S == 1, where the gather select tree
        # takes the single vreg unconditionally).
        xg_h = jnp.where(
            row2 < S * 128, _gather_window_dyn(hub_ref[0], row2, S), 0.0
        )
        cb = pk_ref[i] % 65536
        yauth_ref[cb] = yauth_ref[cb] + _scatter_window_pure(
            col2, xg_h, "plus_times", S, mxu
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def hits_fused_pass(
    layout: BucketedEdges,
    auth: jax.Array,
    hub: jax.Array,
    interpret: bool = False,
):
    """(hub_raw, auth_raw) — both unnormalized accumulations from one
    sweep of the push layout (rows = src, cols = dst, unit values not
    read)."""
    W, C = layout.window, layout.chunk
    S = W // 128
    n_chunks = layout.n_chunks
    n_cb = layout.n_col_blocks
    V = layout.n_vertices
    if n_chunks == 0:
        z = jnp.zeros(V, jnp.float32)
        return z, z
    auth3 = (
        jnp.full(n_cb * W, 0.0, jnp.float32).at[:V].set(auth)
    ).reshape(n_cb, S, 128)
    hub3 = (
        jnp.full(layout.n_row_blocks * W, 0.0, jnp.float32).at[:V].set(hub)
    ).reshape(layout.n_row_blocks, S, 128)
    mshape = (n_chunks, C // 128, 128)
    row2 = layout.row_local.reshape(mshape)
    col2 = layout.col_local.reshape(mshape)
    pk = layout.chunk_rb * 65536 + layout.chunk_cb
    mblock = (1,) + mshape[1:]
    meta_spec = pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] % 65536, 0, 0)),
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)),
            meta_spec,
            meta_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)),
            pl.BlockSpec((n_cb, S, 128), lambda i, pk: (0, 0, 0)),
        ],
    )
    yhub3, yauth3 = pl.pallas_call(
        _make_hits_kernel(S, mxu=True),
        out_shape=[
            jax.ShapeDtypeStruct(
                (layout.n_row_blocks, S, 128), jnp.float32
            ),
            jax.ShapeDtypeStruct((n_cb, S, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, auth3, hub3, row2, col2)
    yhub3 = jnp.where(layout.rb_occupied[:, None, None], yhub3, 0.0)
    return yhub3.reshape(-1)[:V], yauth3.reshape(-1)[:V]
