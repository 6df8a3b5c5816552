"""Windowed one-hot SpMV Pallas kernel: y = A . x over bucketed edges.

The speed-of-light replacement for XLA's scatter/gather lowering of
``spmv_kernel`` (algorithms/spmv.py). Per grid step, one chunk of C edges
from a single (row-window, col-window) bucket:

- gather ``x[col]`` = one-hot(col_local) @ x_window      (MXU matvec)
- messages = gathered * values                           (VPU)
- reduce by row = messages @ one-hot(row_local)          (MXU matvec)
- accumulate into the y window, which persists in VMEM across
  consecutive chunks of the same row block (zeroed on first visit).

Random access never leaves the chip: both irregular addressings are dense
compares + matmuls on W-wide windows — the merge-path fixed-work-per-tile
idea (reference merge_path_v2.hxx) mapped onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import (
    BucketedEdges,
    cached_layout,
    layout_for_graph,
)


def _kernel(rb_ref, cb_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
    i = pl.program_id(0)
    C = row_ref.shape[-1]
    W = x_ref.shape[-1]

    first_visit = jnp.logical_or(i == 0, rb_ref[i] != rb_ref[jnp.maximum(i - 1, 0)])

    @pl.when(first_visit)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    col = col_ref[0, 0, :]
    row = row_ref[0, 0, :]
    # windowed one-hot gather: xg[c] = x_window[col[c]]  (VPU select+reduce)
    xg = jnp.sum(
        jnp.where(col[:, None] == lanes, x_ref[0, 0, :][None, :], 0.0), axis=1
    )
    msg = xg * val_ref[0, 0, :]
    # windowed one-hot scatter-reduce: y[w] += sum_c msg[c] * [row[c] == w]
    y_add = jnp.sum(
        jnp.where(row[:, None] == lanes, msg[:, None], 0.0), axis=0
    )
    y_ref[0, 0, :] = y_ref[0, 0, :] + y_add


@functools.partial(jax.jit, static_argnames=("interpret",))
def bucketed_spmv(layout: BucketedEdges, x: jax.Array, interpret: bool = False):
    """y = A.x from a bucketed edge layout. x: f32[V] -> y: f32[V]."""
    W, C = layout.window, layout.chunk
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    x_pad = jnp.zeros(layout.n_col_blocks * W, jnp.float32).at[:V].set(x)
    # 3-D [n, 1, W]: last-two block dims (1, W) match the array dims, the
    # Mosaic tiling requirement for blocks indexed along the leading axis
    x2 = x_pad.reshape(layout.n_col_blocks, 1, W)
    row2 = layout.row_local.reshape(n_chunks, 1, C)
    col2 = layout.col_local.reshape(n_chunks, 1, C)
    val2 = layout.values.reshape(n_chunks, 1, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda i, rb, cb: (cb[i], 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, rb, cb: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, rb, cb: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, rb, cb: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, W), lambda i, rb, cb: (rb[i], 0, 0)),
    )
    y2 = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((layout.n_row_blocks, 1, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layout.chunk_rb, layout.chunk_cb, x2, row2, col2, val2)
    # Row windows no chunk maps to are never written — zero them out.
    y2 = jnp.where(layout.rb_occupied[:, None, None], y2, 0.0)
    return y2.reshape(-1)[:V]


def spmv(graph, x, window: int = 2048, chunk: int = 256, interpret: bool = False):
    """y = A.x via the Pallas bucketed kernel (layout cached per graph)."""
    if graph.n_edges == 0:
        return jnp.zeros(graph.n_vertices, jnp.float32)
    layout = cached_layout(
        graph.col_indices,
        lambda: layout_for_graph(graph, window=window, chunk=chunk),
        ("push", window, chunk),
    )
    return bucketed_spmv(layout, jnp.asarray(x, jnp.float32), interpret=interpret)
