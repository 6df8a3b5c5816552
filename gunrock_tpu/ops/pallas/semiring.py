"""Semiring SpMV Pallas kernel: the unified TPU advance.

One bucketed windowed one-hot kernel, parameterized by semiring, is the
whole load-balanced advance family (the role the reference spreads across
thread_mapped/block_mapped/merge_path kernels + per-algorithm atomics):

- ``plus_times``  y[r] = sum_e  val_e * x[col_e]   — SpMV, PageRank spread
- ``min_plus``    y[r] = min_e (val_e + x[col_e])  — SSSP relaxation
- ``max_times``   y[r] = max_e  val_e * x[col_e]   — reachability (BFS)

Padding slots carry the reduction identity so they vanish; accumulation
across chunks of the same row window happens in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import BucketedEdges

_BIG = 3.0e38  # f32-safe infinity stand-in (keeps arithmetic finite)

_SEMIRINGS = {
    # name: (identity, pad_value_for_edges)
    "plus_times": (0.0, 0.0),
    "min_plus": (_BIG, _BIG),
    "max_times": (0.0, 0.0),
}


def _make_kernel(semiring: str):
    ident, _ = _SEMIRINGS[semiring]

    def kernel(rb_ref, cb_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        W = x_ref.shape[-1]
        first_visit = jnp.logical_or(
            i == 0, rb_ref[i] != rb_ref[jnp.maximum(i - 1, 0)]
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
        col = col_ref[0, 0, :]
        row = row_ref[0, 0, :]
        val = val_ref[0, 0, :]
        xg = jnp.sum(
            jnp.where(col[:, None] == lanes, x_ref[0, 0, :][None, :], 0.0),
            axis=1,
        )
        if semiring == "min_plus":
            msg = jnp.minimum(val + xg, _BIG)
            scat = jnp.where(row[:, None] == lanes, msg[:, None], _BIG)
            y_add = jnp.min(scat, axis=0)
            y_ref[0, 0, :] = jnp.minimum(y_ref[0, 0, :], y_add)
        elif semiring == "max_times":
            msg = val * xg
            scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
            y_add = jnp.max(scat, axis=0)
            y_ref[0, 0, :] = jnp.maximum(y_ref[0, 0, :], y_add)
        else:  # plus_times
            msg = val * xg
            scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
            y_add = jnp.sum(scat, axis=0)
            y_ref[0, 0, :] = y_ref[0, 0, :] + y_add

    return kernel


@functools.partial(jax.jit, static_argnames=("semiring", "interpret"))
def bucketed_semiring_spmv(
    layout: BucketedEdges,
    x: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
):
    """Generalized y = A (x) over the bucketed layout. For ``min_plus``
    the layout must be built with ``pad_value=inf`` (see
    ``layout_for_graph``); results >= _BIG mean 'no edge' (+inf)."""
    W, C = layout.window, layout.chunk
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
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
        _make_kernel(semiring),
        out_shape=jax.ShapeDtypeStruct((layout.n_row_blocks, 1, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layout.chunk_rb, layout.chunk_cb, x2, row2, col2, val2)
    # Row windows no chunk maps to are never written by the kernel —
    # replace their (uninitialized) contents with the semiring identity.
    y2 = jnp.where(layout.rb_occupied[:, None, None], y2, ident)
    y = y2.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y


def pull_layout(graph, window: int = 2048, chunk: int = 256, pad_value: float = 0.0):
    """Bucketed layout of the TRANSPOSED edge set (rows=dst, cols=src):
    pull advance — y[dst] = reduce over in-edges of f(x[src], w).
    Cached per graph (weakref-validated, dies with the graph)."""
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout, cached_layout

    return cached_layout(
        graph.col_indices,
        lambda: build_bucketed_layout(
            np.asarray(graph.col_indices),  # rows = destinations
            np.asarray(graph.edge_src),  # cols = sources
            np.asarray(graph.values),
            graph.n_vertices,
            window=window,
            chunk=chunk,
            pad_value=pad_value,
        ),
        ("pull", window, chunk, pad_value),
    )
