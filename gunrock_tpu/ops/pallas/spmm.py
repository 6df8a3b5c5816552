"""Bucketed SpMM Pallas kernel: Y = A . X for dense multi-vector X.

The MXU path: where the SpMV kernel's windowed one-hots pay VPU
select+reduce per vector, here the one-hot masks are materialized once
per chunk in bf16 and *matmul'd* against all K columns — mask cost
amortizes over K and the FLOPs ride the systolic array. f32 precision is
recovered with the standard two-pass bf16 split (hi + residual), exact to
~f32 for both X and the messages.

This is the "advance as segmented SpMM" form the north-star design calls
for: batched BFS/PR (vmap over sources) and feature propagation
(GNN-style) are SpMM, not SpMV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import BucketedEdges


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(pk_ref, xh_ref, xl_ref, row_ref, col_ref, val_ref, y_ref):
    i = pl.program_id(0)
    C = row_ref.shape[-1]
    W = xh_ref.shape[-2]

    first_visit = jnp.logical_or(
        i == 0, pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536
    )

    @pl.when(first_visit)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    lanes_cw = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    col = col_ref[0, 0, :]
    row = row_ref[0, 0, :]
    val = val_ref[0, 0, :]
    col_mask = (col[:, None] == lanes_cw).astype(jnp.bfloat16)  # [C, W]
    xg = jnp.dot(
        col_mask, xh_ref[0], preferred_element_type=jnp.float32
    ) + jnp.dot(col_mask, xl_ref[0], preferred_element_type=jnp.float32)
    msg = xg * val[:, None]  # [C, K] f32
    mh = msg.astype(jnp.bfloat16)
    ml = (msg - mh.astype(jnp.float32)).astype(jnp.bfloat16)
    lanes_wc = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    row_mask_t = (row[None, :] == lanes_wc).astype(jnp.bfloat16)  # [W, C]
    y_add = jnp.dot(
        row_mask_t, mh, preferred_element_type=jnp.float32
    ) + jnp.dot(row_mask_t, ml, preferred_element_type=jnp.float32)
    y_ref[0] = y_ref[0] + y_add


@functools.partial(jax.jit, static_argnames=("interpret",))
def bucketed_spmm(layout: BucketedEdges, x: jax.Array, interpret: bool = False):
    """Y = A.X from a bucketed layout. x: f32[V, K] -> y: f32[V, K]."""
    W, C = layout.window, layout.chunk
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    K = x.shape[1]
    x_pad = jnp.zeros((layout.n_col_blocks * W, K), jnp.float32).at[:V].set(x)
    xh, xl = _split_bf16(x_pad)
    xh3 = xh.reshape(layout.n_col_blocks, W, K)
    xl3 = xl.reshape(layout.n_col_blocks, W, K)
    row2 = layout.row_local.reshape(n_chunks, 1, C)
    col2 = layout.col_local.reshape(n_chunks, 1, C)
    val2 = layout.values.reshape(n_chunks, 1, C)

    # packed (rb*65536 + cb): one SMEM prefetch array instead of two
    # (1 MB SMEM cap; see semiring.bucketed_semiring_spmv)
    pk = layout.chunk_rb * 65536 + layout.chunk_cb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, W, K), lambda i, pk: (pk[i] % 65536, 0, 0)),
            pl.BlockSpec((1, W, K), lambda i, pk: (pk[i] % 65536, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, pk: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, pk: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, pk: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, W, K), lambda i, pk: (pk[i] // 65536, 0, 0)),
    )
    y3 = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((layout.n_row_blocks, W, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, xh3, xl3, row2, col2, val2)
    # Row windows no chunk maps to are never written — zero them out.
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, 0.0)
    return y3.reshape(-1, K)[:V]
