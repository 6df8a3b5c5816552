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


def _make_kernel(exact: bool):
    """Dense-grid SpMM kernel. ``exact=True``: single bf16 x operand for
    bf16-exact small-integer inputs (e.g. {0,1} reachability one-hots) —
    half the DMA and MXU work of the hi+lo f32-recovery split."""

    def kernel(pk_ref, *refs):
        if exact:
            xh_ref, row_ref, col_ref, val_ref, y_ref = refs
            xl_ref = None
        else:
            xh_ref, xl_ref, row_ref, col_ref, val_ref, y_ref = refs
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
        xg = jnp.dot(col_mask, xh_ref[0], preferred_element_type=jnp.float32)
        if not exact:
            xg = xg + jnp.dot(
                col_mask, xl_ref[0], preferred_element_type=jnp.float32
            )
        msg = xg * val[:, None]  # [C, K] f32
        mh = msg.astype(jnp.bfloat16)
        lanes_wc = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        row_mask_t = (row[None, :] == lanes_wc).astype(jnp.bfloat16)  # [W, C]
        y_add = jnp.dot(row_mask_t, mh, preferred_element_type=jnp.float32)
        if not exact:
            ml = (msg - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            y_add = y_add + jnp.dot(
                row_mask_t, ml, preferred_element_type=jnp.float32
            )
        y_ref[0] = y_ref[0] + y_add

    return kernel


_kernel = _make_kernel(exact=False)  # back-compat alias


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def bucketed_spmm(layout: BucketedEdges, x: jax.Array, interpret: bool = False,
                  exact: bool = False):
    """Y = A.X from a bucketed layout. x: f32[V, K] -> y: f32[V, K].
    ``exact=True``: x values are bf16-exact small integers (|x| <= 256,
    integral — e.g. BFS reachability one-hots), skipping the hi+lo
    split."""
    from gunrock_tpu.ops.pallas.paged import PagedEdges, paged_spmm

    if isinstance(layout, PagedEdges):
        return paged_spmm(layout, x, interpret=interpret, exact=exact)
    W, C = layout.window, layout.chunk
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    K = x.shape[1]
    x_pad = jnp.zeros((layout.n_col_blocks * W, K), jnp.float32).at[:V].set(x)
    if exact:
        x_ops = (x_pad.astype(jnp.bfloat16).reshape(layout.n_col_blocks, W, K),)
    else:
        xh, xl = _split_bf16(x_pad)
        x_ops = (
            xh.reshape(layout.n_col_blocks, W, K),
            xl.reshape(layout.n_col_blocks, W, K),
        )
    row2 = layout.row_local.reshape(n_chunks, 1, C)
    col2 = layout.col_local.reshape(n_chunks, 1, C)
    val2 = layout.values.reshape(n_chunks, 1, C)

    # packed (rb*65536 + cb): one SMEM prefetch array instead of two
    # (1 MB SMEM cap; see semiring.bucketed_semiring_spmv)
    pk = layout.chunk_rb * 65536 + layout.chunk_cb
    x_spec = pl.BlockSpec((1, W, K), lambda i, pk: (pk[i] % 65536, 0, 0))
    meta_spec = pl.BlockSpec((1, 1, C), lambda i, pk: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[x_spec] * len(x_ops) + [meta_spec] * 3,
        out_specs=pl.BlockSpec((1, W, K), lambda i, pk: (pk[i] // 65536, 0, 0)),
    )
    y3 = pl.pallas_call(
        _make_kernel(exact),
        out_shape=jax.ShapeDtypeStruct((layout.n_row_blocks, W, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, *x_ops, row2, col2, val2)
    # Row windows no chunk maps to are never written — zero them out.
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, 0.0)
    return y3.reshape(-1, K)[:V]


def _sparse_kernel(exact: bool):
    """Chunk-skipping SpMM kernel. ``exact=True`` is the small-integer
    fast path: x is a single bf16 operand (values in [-256, 256] are
    bf16-exact, e.g. one-hot deltas), halving DMA and MXU work vs the
    hi+lo split; accumulation stays f32 in VMEM either way."""

    def kernel(pk_ref, perm_ref, cnt_ref, *refs):
        if exact:
            xh_ref, row_ref, col_ref, val_ref, y_ref = refs
            xl_ref = None
        else:
            xh_ref, xl_ref, row_ref, col_ref, val_ref, y_ref = refs
        i = pl.program_id(0)
        active = i < cnt_ref[0]
        first_visit = active & jnp.logical_or(
            i == 0, pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        @pl.when(active)
        def _():
            C = row_ref.shape[-1]
            W = xh_ref.shape[-2]
            lanes_cw = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
            col = col_ref[0, 0, :]
            row = row_ref[0, 0, :]
            val = val_ref[0, 0, :]
            col_mask = (col[:, None] == lanes_cw).astype(jnp.bfloat16)
            xg = jnp.dot(col_mask, xh_ref[0], preferred_element_type=jnp.float32)
            if not exact:
                xg = xg + jnp.dot(
                    col_mask, xl_ref[0], preferred_element_type=jnp.float32
                )
            msg = xg * val[:, None]  # [C, K] f32
            lanes_wc = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
            row_mask_t = (row[None, :] == lanes_wc).astype(jnp.bfloat16)
            mh = msg.astype(jnp.bfloat16)
            y_add = jnp.dot(row_mask_t, mh, preferred_element_type=jnp.float32)
            if not exact:
                ml = (msg - mh.astype(jnp.float32)).astype(jnp.bfloat16)
                y_add = y_add + jnp.dot(
                    row_mask_t, ml, preferred_element_type=jnp.float32
                )
            y_ref[0] = y_ref[0] + y_add

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "exact", "tail_grids")
)
def bucketed_spmm_sparse(
    layout: BucketedEdges,
    x: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    exact: bool = False,
    tail_grids: tuple[int, ...] | None = None,
):
    """Frontier-sparse Y = A.X (plus_times): chunks whose source window
    has no ``active`` vertex — or, with ``out_mask``, whose dest window
    has no masked vertex — are skipped in-grid, so cost tracks the
    frontier instead of O(E). Rows of skipped/untouched windows return 0,
    making the result accumulation-safe (carry += spmm_sparse(delta)).

    ``exact=True``: callers whose x values are bf16-exact small integers
    (|x| <= 256 and integral, e.g. signed one-hot deltas) skip the hi+lo
    f32-recovery split — half the DMA and half the MXU work.

    Collapsed frontiers run on a smaller compiled grid (see
    semiring._tail_grid_dispatch), cutting the per-call floor of
    iterating 10k+ predicated-off slots."""
    from gunrock_tpu.ops.pallas.paged import PagedEdges, paged_spmm_sparse

    if isinstance(layout, PagedEdges):
        return paged_spmm_sparse(layout, x, active, interpret=interpret,
                                 out_mask=out_mask, exact=exact,
                                 tail_grids=tail_grids)
    from gunrock_tpu.ops.pallas.semiring import _sparse_chunk_select

    W, C = layout.window, layout.chunk
    n_chunks = layout.n_chunks
    n_cb = layout.n_col_blocks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices
    K = x.shape[1]
    if n_chunks == 0:
        return jnp.zeros((V, K), jnp.float32)

    ch_act, pk_r, perm, count = _sparse_chunk_select(layout, active, out_mask)

    x_pad = jnp.zeros((n_cb * W, K), jnp.float32).at[:V].set(x)
    if exact:
        x_ops = (x_pad.astype(jnp.bfloat16).reshape(n_cb, W, K),)
    else:
        xh, xl = _split_bf16(x_pad)
        x_ops = (xh.reshape(n_cb, W, K), xl.reshape(n_cb, W, K))
    row2 = layout.row_local.reshape(n_chunks, 1, C)
    col2 = layout.col_local.reshape(n_chunks, 1, C)
    val2 = layout.values.reshape(n_chunks, 1, C)
    call_args = (pk_r, perm, count.reshape(1), *x_ops, row2, col2, val2)

    x_spec = pl.BlockSpec((1, W, K), lambda i, pk, pm, ct: (pk[i] % 65536, 0, 0))
    meta_spec = pl.BlockSpec((1, 1, C), lambda i, pk, pm, ct: (pm[i], 0, 0))
    in_specs = [x_spec] * len(x_ops) + [meta_spec] * 3
    out_spec = pl.BlockSpec(
        (1, W, K), lambda i, pk, pm, ct: (pk[i] // 65536, 0, 0)
    )

    from gunrock_tpu.ops.pallas.semiring import _tail_grid_dispatch

    y3 = _tail_grid_dispatch(
        _sparse_kernel(exact),
        jax.ShapeDtypeStruct((n_rb, W, K), jnp.float32),
        in_specs, out_spec, call_args, count, n_chunks, interpret,
        tail_grids,
    )
    # dynamic occupancy: row windows touched by >=1 ACTIVE chunk
    rb_touched = (
        jnp.zeros(n_rb, bool)
        .at[jnp.where(ch_act, layout.chunk_rb, n_rb)]
        .set(True, mode="drop")
    )
    y3 = jnp.where(rb_touched[:, None, None], y3, 0.0)
    return y3.reshape(-1, K)[:V]
