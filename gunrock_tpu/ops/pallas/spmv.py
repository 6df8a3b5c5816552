"""Windowed one-hot SpMV: y = A . x over bucketed edges.

The speed-of-light replacement for XLA's scatter/gather lowering of
``spmv_kernel`` (algorithms/spmv.py); role of the reference's merge-path
advance for the SpMV case (reference merge_path_v2.hxx).

Since the v2 two-level MXU kernel landed, SpMV IS the ``plus_times``
semiring — this module is the thin orientation/caching wrapper (the
duplicate VPU kernel it used to hold is gone; see
``ops/pallas/semiring.py`` for the kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gunrock_tpu.ops.pallas.layout import (
    BucketedEdges,
    cached_layout,
    layout_for_graph,
)


def bucketed_spmv(layout: BucketedEdges, x: jax.Array, interpret: bool = False):
    """y = A.x from a bucketed edge layout. x: f32[V] -> y: f32[V]."""
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv

    return bucketed_semiring_spmv(layout, x, "plus_times", interpret=interpret)


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
