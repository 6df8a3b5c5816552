"""SpMV: y = A.x over the CSR graph.

Role of reference include/gunrock/algorithms/spmv.hxx — push advance over
the whole graph with ``atomic::add(y[src], w * x[nbr])`` and no output
frontier (spmv.hxx:84-110); the pull variant via neighborreduce is defunct
in the reference (spmv.hxx:113-135) but first-class here.

TPU redesign: one sorted segmented sum keyed by source over the CSR edge
order (deterministic, no atomics) — the neighbor_reduce operator. The
Pallas row-tiled kernel (ops.pallas) is the speed-of-light path selected
via ``Options.load_balance``.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import LoadBalance, Options


@dataclasses.dataclass
class Param:
    pass


@dataclasses.dataclass
class Result:
    y: jax.Array  # float32[V]
    elapsed_ms: float


def spmv_kernel(graph: Graph, x: jax.Array) -> jax.Array:
    """Pure y = A.x (push formulation, reference spmv.hxx:84-110)."""
    contrib = graph.values * x[graph.col_indices]
    return jax.ops.segment_sum(
        contrib,
        graph.edge_src,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )


def spmv_pull_kernel(graph: Graph, x: jax.Array) -> jax.Array:
    """Pull variant: y[v] = sum over in-edges (u,v) of w * x[u] applied to
    A^T — i.e. y = A.x computed in CSC order (the capability the
    reference lost with neighborreduce, spmv.hxx:113-135)."""
    contrib = graph.csc_values * x[graph.csc_rows]
    y_t = jax.ops.segment_sum(
        contrib,
        graph.csc_dst,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )
    return y_t  # == A^T.x; for symmetric graphs equals A.x


def spmm_kernel(graph: Graph, X, layout=None, interpret: bool | None = None):
    """Y = A.X for dense X[V, K] via the MXU bucketed SpMM Pallas kernel
    (ops/pallas/spmm.py) — masks amortize over the K columns, ~50x the
    per-vector cost of SpMV at K=128 on chip. Requires a concrete graph
    (layout built host-side) unless ``layout`` is given."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import layout_for_graph
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    if layout is None:
        layout = layout_for_graph(graph)
    if interpret is None:
        interpret = use_interpret()
    return bucketed_spmm(layout, jnp.asarray(X, jnp.float32), interpret=interpret)


def run(graph: Graph, x, options: Options | None = None, warmup: bool = True) -> Result:
    """Role of reference ``spmv::run`` (spmv.hxx:139-170)."""
    from gunrock_tpu.ops.configs import default_options

    options = options or default_options()
    x = jnp.asarray(x, dtype=jnp.float32)
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import layout_for_graph
        from gunrock_tpu.ops.pallas.spmv import bucketed_spmv

        # layout built host-side before tracing (concrete graph
        # required); SpMV is dense-only, so the bigger-chunk layout wins
        # (layout.dense_window_chunk, BASELINE round-4 chunk sweep)
        from gunrock_tpu.ops.pallas.layout import dense_window_chunk

        interp = use_interpret()
        dwc = dense_window_chunk(graph.n_vertices, interp)
        w, c = dwc if dwc else (None, None)
        layout = layout_for_graph(graph, window=w, chunk=c)
        from gunrock_tpu.utils.jitcache import cached_jit

        # layout as jit argument (closure would bake it into the HLO)
        fn = cached_jit(
            ("spmv_pallas", interp),
            lambda: lambda g, xv, lay: bucketed_spmv(lay, xv, interpret=interp),
        )
    else:
        from gunrock_tpu.utils.jitcache import cached_jit

        layout = None
        fn = cached_jit(
            "spmv_xla", lambda: lambda g, xv, lay: spmv_kernel(g, xv)
        )
    if warmup:
        jax.block_until_ready(fn(graph, x, layout))
    t0 = time.perf_counter()
    y = jax.block_until_ready(fn(graph, x, layout))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(y=y, elapsed_ms=elapsed_ms)
