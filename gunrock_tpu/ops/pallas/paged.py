"""Paged-metadata bucketed semiring kernel (round 3) — the big-graph
escape hatch for the SMEM scalar-prefetch wall (docs/design.md §12).

The SMEM design (semiring.py) caps chunk metadata at ~125K chunks
(1 MB SMEM), forcing ``auto_window_chunk`` to double the window W above
scale 19. The per-edge one-hot compare cost is fragmentation×W; once the
bucket grid stops being saturated (above ~s21) each doubling doubles
every dense pass. Host-measured on rmat s22 + degree-sort:
W=2048/C=256 needs 840K chunks (6.7 MB of metadata — 6.7x over SMEM)
but costs 6.8K compare-ops/edge, vs 25.8K for the SMEM-feasible
W=16384/C=2048 — a 3.8x compute reduction IF metadata can ride
somewhere other than SMEM. This kernel pages it:

- 2-D grid (page, chunk-in-page). Each page's metadata block
  (PAGE×8 int32, 16 KB) is a pipelined **SMEM-blocked input** — far
  under budget and double-buffered by the normal Pallas pipeline.
- Edge chunks are pipelined **VMEM-blocked inputs** indexed by the flat
  grid step (their index needs no metadata).
- The two data-DEPENDENT accesses are **manual DMAs**: the x window
  (``x[cb]`` → double-buffered VMEM scratch; chunk j+1's load overlaps
  chunk j's compute) and the output row block (a VMEM accumulator per
  contiguous rb run, DMA'd to the ANY-space output at run end —
  synchronous: the 8-64 KB writeback is ~1 µs against ~5 µs/chunk of
  compute, so run-end stalls are noise and the single-accumulator
  design needs no parity/drain bookkeeping).

meta fields per chunk: [rb, cb, first, last, 0, 0, 0, 0] — first/last
delimit the contiguous rb run (chunks are sorted by (rb, cb), exactly
as in layout.build_bucketed_layout, whose arrays this layout repacks).
Padding chunks (to a whole page): first=last=0, rb=cb=0, values at the
semiring pad identity — they accumulate identity into an already-
flushed accumulator and never write back.

Role: same advance contract as semiring.bucketed_semiring_spmv
(reference merge_path.hxx), selected via GUNROCK_PAGED_META=1 or
explicitly; chip A/B in benchmarks/ab_paged.py.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.semiring import _BIG, _SEMIRINGS


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["meta", "rowcol", "values", "rb_occupied", "src_bits",
                 "dst_bits"],
    meta_fields=["window", "chunk", "page", "n_pages", "n_chunks",
                 "n_row_blocks", "n_col_blocks", "n_vertices"],
)
@dataclasses.dataclass(frozen=True)
class PagedEdges:
    meta: jax.Array  # int32[n_pages*page, 8] — rb, cb, first, last, 0...
    rowcol: jax.Array  # int32[n_chunks_pad, 2, chunk//128, 128] — row, col
    values: jax.Array  # float32[n_chunks_pad, chunk//128, 128]
    rb_occupied: jax.Array  # bool[n_row_blocks]
    src_bits: jax.Array  # uint32[n_pages*page] — sub-block occupancy (0 for pad chunks)
    dst_bits: jax.Array  # uint32[n_pages*page]
    window: int
    chunk: int
    page: int
    n_pages: int
    n_chunks: int  # real (pre-padding) chunk count
    n_row_blocks: int
    n_col_blocks: int
    n_vertices: int


def build_paged_layout(
    rows, cols, values, n_vertices: int,
    window: int = 2048, chunk: int = 256, page: int = 512,
    pad_value: float = 0.0,
) -> PagedEdges:
    """Repack layout.build_bucketed_layout's chunked arrays into the
    paged form (host-side, numpy). No SMEM chunk-count ceiling."""
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout

    b = build_bucketed_layout(
        rows, cols, values, n_vertices,
        window=window, chunk=chunk, pad_value=pad_value,
    )
    n_chunks = b.n_chunks
    n_pages = max(1, -(-n_chunks // page))
    n_pad = n_pages * page

    rb = np.asarray(b.chunk_rb, np.int32)
    cb = np.asarray(b.chunk_cb, np.int32)
    first = np.empty(n_chunks, np.int32)
    last = np.empty(n_chunks, np.int32)
    if n_chunks:
        first[0] = 1
        first[1:] = (rb[1:] != rb[:-1]).astype(np.int32)
        last[:-1] = first[1:]
        last[-1] = 1
    meta = np.zeros((n_pad, 8), np.int32)
    meta[:n_chunks, 0] = rb
    meta[:n_chunks, 1] = cb
    meta[:n_chunks, 2] = first
    meta[:n_chunks, 3] = last

    # edge metadata rides TILED as [2, Cr, 128] per chunk: the v4/v5
    # dynamic-gather kernels consume [Cr, 128] tiles directly (in-kernel
    # [C] <-> [Cr, 128] reshapes are Mosaic "unsupported shape cast"s)
    assert chunk % 128 == 0, "paged layouts need chunk % 128 == 0"
    cr = chunk // 128
    rl = np.asarray(b.row_local).reshape(n_chunks, cr, 128)
    cl = np.asarray(b.col_local).reshape(n_chunks, cr, 128)
    vals = np.asarray(b.values).reshape(n_chunks, cr, 128)
    rowcol = np.zeros((n_pad, 2, cr, 128), np.int32)
    rowcol[:n_chunks, 0] = rl
    rowcol[:n_chunks, 1] = cl
    vpad = np.full((n_pad, cr, 128), pad_value, np.float32)
    vpad[:n_chunks] = vals
    # sub-block occupancy words (pad chunks stay 0 -> never selected)
    src_bits = np.zeros(n_pad, np.uint32)
    dst_bits = np.zeros(n_pad, np.uint32)
    src_bits[:n_chunks] = np.asarray(b.src_bits)
    dst_bits[:n_chunks] = np.asarray(b.dst_bits)
    return PagedEdges(
        meta=jnp.asarray(meta),
        rowcol=jnp.asarray(rowcol),
        values=jnp.asarray(vpad),
        rb_occupied=b.rb_occupied,
        src_bits=jnp.asarray(src_bits),
        dst_bits=jnp.asarray(dst_bits),
        window=window, chunk=chunk, page=page, n_pages=n_pages,
        n_chunks=n_chunks, n_row_blocks=b.n_row_blocks,
        n_col_blocks=b.n_col_blocks, n_vertices=n_vertices,
    )


def _chunk_compute(semiring, row2, col2, val2, x2, S, exact=False):
    """Whole-chunk advance shared by the dense and sparse paged kernels:
    the v5 dynamic-gather + MXU-scatter math (semiring._compute_chunk_v4;
    min/max fall back to the one-hot scatter inside). Tiled [Cr, 128]
    edge operands; returns y_add [S, 128]."""
    from gunrock_tpu.ops.pallas.semiring import _compute_chunk_v4

    return _compute_chunk_v4(x2, row2, col2, val2, semiring, S, mxu=True,
                             exact=exact)


def _make_paged_kernel(semiring: str, S: int, C: int, PAGE: int):
    ident, _ = _SEMIRINGS[semiring]
    W = S * 128

    def kernel(meta_ref, rc_ref, val_ref, x_any, y_any, xbuf, acc, xsem,
               ysem):
        j = pl.program_id(1)

        def x_dma(jj, slot):
            return pltpu.make_async_copy(
                x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
            )

        @pl.when(j == 0)
        def _():
            x_dma(0, 0).start()

        @pl.when(j + 1 < PAGE)
        def _():
            x_dma(j + 1, (j + 1) % 2).start()

        rb = meta_ref[j, 0]
        first = meta_ref[j, 2]
        last = meta_ref[j, 3]

        @pl.when(first == 1)
        def _():
            acc[...] = jnp.full_like(acc, ident)

        x_dma(j, j % 2).wait()

        row2 = rc_ref[0, 0]
        col2 = rc_ref[0, 1]
        val2 = val_ref[0]
        y_add = _chunk_compute(semiring, row2, col2, val2, xbuf[j % 2], S)
        if semiring == "min_plus":
            acc[...] = jnp.minimum(acc[...], y_add)
        elif semiring == "max_times":
            acc[...] = jnp.maximum(acc[...], y_add)
        else:
            acc[...] = acc[...] + y_add

        # synchronous run-end writeback: start + wait in-step (the
        # 8-64 KB DMA is noise next to per-chunk compute, and a single
        # accumulator then needs no cross-run bookkeeping)
        @pl.when(last == 1)
        def _():
            w = pltpu.make_async_copy(acc, y_any.at[rb], ysem)
            w.start()
            w.wait()

    return kernel


def _make_paged_sparse_kernel(semiring: str, S: int, C: int, PAGE: int,
                              exact: bool = False):
    """Frontier-sparse paged kernel: metadata (incl. the active-first
    chunk permutation) is computed ON DEVICE per call and paged through
    SMEM exactly like the dense variant's — but edge chunks are now
    data-dependent (permuted), so rowcol/values also arrive by manual
    double-buffered DMA. Inactive slots (slot >= active count) do
    nothing at all — no DMA, no compute, no write (the output is
    ANY-space and manually written, so the scalar-prefetch kernel's
    stale-VMEM-flush hazard class does not exist here).

    meta fields: [rb, cb, first, last, active, chunk_idx, 0, 0]."""
    ident, _ = _SEMIRINGS[semiring]
    W = S * 128

    def kernel(meta_ref, rc_any, val_any, x_any, y_any, xbuf, ebuf, vbuf,
               acc, xsem, esem, vsem, ysem):
        j = pl.program_id(1)

        def dmas(jj, slot):
            return (
                pltpu.make_async_copy(
                    x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
                ),
                pltpu.make_async_copy(
                    rc_any.at[meta_ref[jj, 5]], ebuf.at[slot], esem.at[slot]
                ),
                pltpu.make_async_copy(
                    val_any.at[meta_ref[jj, 5]], vbuf.at[slot], vsem.at[slot]
                ),
            )

        def start(jj, slot):
            a, b, c = dmas(jj, slot)
            a.start()
            b.start()
            c.start()

        @pl.when((j == 0) & (meta_ref[0, 4] == 1))
        def _():
            start(0, 0)

        # `&` does not short-circuit and pl.when predicates are built
        # eagerly: the meta row index must be clamped or j == PAGE-1
        # reads SMEM row PAGE (undefined on real Mosaic; interpret mode
        # clamps and hides it — code-review round-3 finding)
        jn = jnp.minimum(j + 1, PAGE - 1)

        @pl.when((j + 1 < PAGE) & (meta_ref[jn, 4] == 1))
        def _():
            start(jn, (j + 1) % 2)

        active = meta_ref[j, 4] == 1

        @pl.when(active & (meta_ref[j, 2] == 1))
        def _():
            acc[...] = jnp.full_like(acc, ident)

        @pl.when(active)
        def _():
            a, b, c = dmas(j, j % 2)
            a.wait()
            b.wait()
            c.wait()
            row2 = ebuf[j % 2, 0]
            col2 = ebuf[j % 2, 1]
            val2 = vbuf[j % 2]
            y_add = _chunk_compute(semiring, row2, col2, val2,
                                   xbuf[j % 2], S, exact)
            if semiring == "min_plus":
                acc[...] = jnp.minimum(acc[...], y_add)
            elif semiring == "max_times":
                acc[...] = jnp.maximum(acc[...], y_add)
            else:
                acc[...] = acc[...] + y_add

        @pl.when(active & (meta_ref[j, 3] == 1))
        def _():
            w = pltpu.make_async_copy(acc, y_any.at[meta_ref[j, 0]], ysem)
            w.start()
            w.wait()

    return kernel


def _sparse_meta(layout: PagedEdges, active, out_mask):
    """Device-side active-chunk selection + paged-meta packing (the
    paged analog of semiring._sparse_chunk_select). A chunk runs iff its
    SOURCE window holds an ``active`` vertex (and, when given, its DEST
    window holds an ``out_mask`` vertex). Returns (meta int32[n_pad, 8],
    count, rb_touched)."""
    W = layout.window
    n_pad = layout.n_pages * layout.page
    n_cb = layout.n_col_blocks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices
    chunk_rb = layout.meta[:, 0]
    chunk_cb = layout.meta[:, 1]
    # real chunks only: padding rows of layout.meta carry rb=cb=0 and
    # must never activate
    is_real = (
        jnp.arange(n_pad, dtype=jnp.int32) < jnp.int32(layout.n_chunks)
    )

    # sub-block (W/32-vertex) activity resolution via the per-chunk
    # occupancy words — see semiring._sparse_chunk_select (pad chunks
    # carry 0 bits, so is_real is implied but kept for clarity)
    bit_w = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    act_pad = jnp.zeros(n_cb * W, bool).at[:V].set(active)
    act_blk = jnp.any(act_pad.reshape(n_cb, 32, W // 32), axis=2)
    act_words = jnp.sum(
        jnp.where(act_blk, bit_w, jnp.uint32(0)), axis=1, dtype=jnp.uint32
    )
    ch_act = ((act_words[chunk_cb] & layout.src_bits) != 0) & is_real
    if out_mask is not None:
        om_pad = jnp.zeros(n_rb * W, bool).at[:V].set(out_mask)
        om_blk = jnp.any(om_pad.reshape(n_rb, 32, W // 32), axis=2)
        om_words = jnp.sum(
            jnp.where(om_blk, bit_w, jnp.uint32(0)), axis=1,
            dtype=jnp.uint32,
        )
        ch_act = ch_act & ((om_words[chunk_rb] & layout.dst_bits) != 0)
    pos = jnp.cumsum(ch_act.astype(jnp.int32)) - 1
    count = (pos[-1] + 1).astype(jnp.int32)
    perm = (
        jnp.zeros(n_pad, jnp.int32)
        .at[jnp.where(ch_act, pos, n_pad)]
        .set(jnp.arange(n_pad, dtype=jnp.int32), mode="drop")
    )
    rb_p = chunk_rb[perm]
    cb_p = chunk_cb[perm]
    slot = jnp.arange(n_pad, dtype=jnp.int32)
    is_act = slot < count
    prev_rb = jnp.concatenate([jnp.full(1, -1, jnp.int32), rb_p[:-1]])
    next_rb = jnp.concatenate([rb_p[1:], jnp.full(1, -1, jnp.int32)])
    first = (is_act & (rb_p != prev_rb)).astype(jnp.int32)
    last = (is_act & ((slot == count - 1) | (rb_p != next_rb))).astype(
        jnp.int32
    )
    meta = jnp.stack(
        [rb_p, cb_p, first, last, is_act.astype(jnp.int32), perm,
         jnp.zeros(n_pad, jnp.int32), jnp.zeros(n_pad, jnp.int32)],
        axis=1,
    )
    rb_touched = (
        jnp.zeros(n_rb, bool)
        .at[jnp.where(ch_act, chunk_rb, n_rb)]
        .set(True, mode="drop")
    )
    return meta, count, rb_touched


@functools.partial(
    jax.jit,
    static_argnames=("semiring", "interpret", "tail_grids", "exact"),
)
def paged_semiring_spmv_sparse(
    layout: PagedEdges,
    x: jax.Array,
    active: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
    exact: bool = False,
):
    """Frontier-sparse paged advance — same contract as
    semiring.bucketed_semiring_spmv_sparse (chunks whose source window
    holds no active vertex are skipped; the smallest precompiled page
    grid holding the active count runs)."""
    W, C, PAGE = layout.window, layout.chunk, layout.page
    S = W // 128
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    if layout.n_chunks == 0:
        fill = jnp.inf if semiring == "min_plus" else ident
        return jnp.full(V, fill, jnp.float32)

    meta, count, rb_touched = _sparse_meta(layout, active, out_mask)
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)

    def call(n_pages):
        return pl.pallas_call(
            _make_paged_sparse_kernel(semiring, S, C, PAGE, exact),
            out_shape=jax.ShapeDtypeStruct(
                (layout.n_row_blocks, S, 128), jnp.float32
            ),
            grid=(n_pages, PAGE),
            in_specs=[
                pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, S, 128), jnp.float32),
                pltpu.VMEM((2, 2, C // 128, 128), jnp.int32),
                pltpu.VMEM((2, C // 128, 128), jnp.float32),
                pltpu.VMEM((S, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                has_side_effects=True,
            ),
            interpret=interpret,
        )(meta, layout.rowcol, layout.values, x3)

    # tail-grid dispatch over PAGE granularity (explicit kwarg wins,
    # falling back to the module default semiring._TAIL_GRIDS)
    from gunrock_tpu.ops.pallas.semiring import _TAIL_GRIDS

    tg = _TAIL_GRIDS if tail_grids is None else tail_grids
    n_pages = layout.n_pages
    grids = sorted({max(1, n_pages // g) for g in tg} | {n_pages})
    pages_needed = (count + PAGE - 1) // PAGE

    def dispatch(idx):
        if idx == len(grids) - 1:
            return lambda: call(grids[idx])
        return lambda: jax.lax.cond(
            pages_needed <= grids[idx], lambda: call(grids[idx]),
            dispatch(idx + 1),
        )

    y3 = dispatch(0)()
    y3 = jnp.where(rb_touched[:, None, None], y3, ident)
    y = y3.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y


@functools.partial(jax.jit, static_argnames=("semiring", "interpret"))
def paged_semiring_spmv(
    layout: PagedEdges,
    x: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
):
    """Dense semiring advance over a PagedEdges layout — identical result
    contract to semiring.bucketed_semiring_spmv."""
    W, C, PAGE = layout.window, layout.chunk, layout.page
    S = W // 128
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)

    y3 = pl.pallas_call(
        _make_paged_kernel(semiring, S, C, PAGE),
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_row_blocks, S, 128), jnp.float32
        ),
        grid=(layout.n_pages, PAGE),
        in_specs=[
            pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0, 0)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, S, 128), jnp.float32),  # x double buffer
            pltpu.VMEM((S, 128), jnp.float32),  # rb-run accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(layout.meta, layout.rowcol, layout.values, x3)
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, ident)
    y = y3.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y


def _spmm_chunk(row2, col2, val2, xw, W: int, exact: bool):
    """Per-chunk SpMM advance on tiled [Cr, 128] edge operands: per tile
    row a [128, W] col one-hot matmul gathers all K columns, a [W, 128]
    row one-hot matmul scatters them (spmm._make_kernel math, tiled so
    the paged storage needs no in-kernel shape casts). Returns y_add
    [W, K] f32."""
    Cr = row2.shape[0]
    lanes_cw = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    lanes_wc = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    y_add = None
    for cr in range(Cr):
        col_mask = (col2[cr][:, None] == lanes_cw).astype(jnp.bfloat16)
        xg = jnp.dot(col_mask, xw[0], preferred_element_type=jnp.float32)
        if not exact:
            xg = xg + jnp.dot(col_mask, xw[1],
                              preferred_element_type=jnp.float32)
        msg = xg * val2[cr][:, None]  # [128, K] f32
        row_mask_t = (row2[cr][None, :] == lanes_wc).astype(jnp.bfloat16)
        mh = msg.astype(jnp.bfloat16)
        part = jnp.dot(row_mask_t, mh, preferred_element_type=jnp.float32)
        if not exact:
            ml = (msg - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            part = part + jnp.dot(row_mask_t, ml,
                                  preferred_element_type=jnp.float32)
        y_add = part if y_add is None else y_add + part
    return y_add


def _make_paged_spmm_kernel(S: int, C: int, PAGE: int, K: int, exact: bool):
    """Dense paged SpMM kernel: same page/run structure as
    _make_paged_kernel, but the one-hot masks are bf16 MXU matmuls
    against all K columns (spmm._make_kernel math) and the x window /
    accumulator carry a K axis. ``exact``: single bf16 x operand
    (bf16-exact small integers); else hi+lo split recovers f32."""
    W = S * 128
    n_x = 1 if exact else 2

    def kernel(meta_ref, rc_ref, val_ref, x_any, y_any, xbuf, acc, xsem,
               ysem):
        j = pl.program_id(1)

        def x_dma(jj, slot):
            return pltpu.make_async_copy(
                x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
            )

        @pl.when(j == 0)
        def _():
            x_dma(0, 0).start()

        jn = jnp.minimum(j + 1, PAGE - 1)

        @pl.when(j + 1 < PAGE)
        def _():
            x_dma(jn, (j + 1) % 2).start()

        rb = meta_ref[j, 0]
        first = meta_ref[j, 2]
        last = meta_ref[j, 3]

        @pl.when(first == 1)
        def _():
            acc[...] = jnp.zeros_like(acc)

        x_dma(j, j % 2).wait()

        xw = xbuf[j % 2]  # (n_x, W, K) bf16
        y_add = _spmm_chunk(rc_ref[0, 0], rc_ref[0, 1], val_ref[0], xw,
                            W, exact)
        acc[...] = acc[...] + y_add

        @pl.when(last == 1)
        def _():
            w = pltpu.make_async_copy(acc, y_any.at[rb], ysem)
            w.start()
            w.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def paged_spmm(
    layout: PagedEdges,
    x: jax.Array,
    interpret: bool = False,
    exact: bool = False,
):
    """Dense Y = A.X over a PagedEdges layout — same contract as
    spmm.bucketed_spmm (plus_times, K columns on the MXU)."""
    from gunrock_tpu.ops.pallas.spmm import _split_bf16

    W, C, PAGE = layout.window, layout.chunk, layout.page
    S = W // 128
    V = layout.n_vertices
    K = x.shape[1]
    # Manual DMAs (x windows in, acc->y out) slice the trailing K axis;
    # Mosaic requires those slices 128-lane-aligned (real-chip compile
    # error 2026-08-19: "Slice shape along dimension 3 must be aligned
    # to tiling (128), but is 32"). The (8,128) tiled layout lane-pads
    # K physically anyway, so padding K up to 128 moves the same bytes
    # the hardware always would — zero real cost, and the MXU contracts
    # 128-wide regardless.
    Kp = -(-K // 128) * 128
    x_pad = jnp.zeros(
        (layout.n_col_blocks * W, Kp), jnp.float32
    ).at[:V, :K].set(x)
    if exact:
        x3 = x_pad.astype(jnp.bfloat16).reshape(
            layout.n_col_blocks, 1, W, Kp
        )
    else:
        xh, xl = _split_bf16(x_pad)
        x3 = jnp.stack(
            [xh.reshape(layout.n_col_blocks, W, Kp),
             xl.reshape(layout.n_col_blocks, W, Kp)], axis=1
        )
    n_x = 1 if exact else 2

    y3 = pl.pallas_call(
        _make_paged_spmm_kernel(S, C, PAGE, Kp, exact),
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_row_blocks, W, Kp), jnp.float32
        ),
        grid=(layout.n_pages, PAGE),
        in_specs=[
            pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0, 0)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_x, W, Kp), jnp.bfloat16),  # x double buffer
            pltpu.VMEM((W, Kp), jnp.float32),  # rb-run accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(layout.meta, layout.rowcol, layout.values, x3)
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, 0.0)
    return y3.reshape(-1, Kp)[:V, :K]


def _make_paged_spmm_sparse_kernel(S: int, C: int, PAGE: int, K: int,
                                   exact: bool):
    """Frontier-sparse paged SpMM: _make_paged_sparse_kernel's structure
    (device-computed permuted metadata, manual edge DMA, inert inactive
    slots) with the K-column MXU math of _make_paged_spmm_kernel."""
    W = S * 128
    n_x = 1 if exact else 2

    def kernel(meta_ref, rc_any, val_any, x_any, y_any, xbuf, ebuf, vbuf,
               acc, xsem, esem, vsem, ysem):
        j = pl.program_id(1)

        def dmas(jj, slot):
            return (
                pltpu.make_async_copy(
                    x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
                ),
                pltpu.make_async_copy(
                    rc_any.at[meta_ref[jj, 5]], ebuf.at[slot], esem.at[slot]
                ),
                pltpu.make_async_copy(
                    val_any.at[meta_ref[jj, 5]], vbuf.at[slot], vsem.at[slot]
                ),
            )

        def start(jj, slot):
            a, b, c = dmas(jj, slot)
            a.start()
            b.start()
            c.start()

        @pl.when((j == 0) & (meta_ref[0, 4] == 1))
        def _():
            start(0, 0)

        jn = jnp.minimum(j + 1, PAGE - 1)

        @pl.when((j + 1 < PAGE) & (meta_ref[jn, 4] == 1))
        def _():
            start(jn, (j + 1) % 2)

        active = meta_ref[j, 4] == 1

        @pl.when(active & (meta_ref[j, 2] == 1))
        def _():
            acc[...] = jnp.zeros_like(acc)

        @pl.when(active)
        def _():
            a, b, c = dmas(j, j % 2)
            a.wait()
            b.wait()
            c.wait()
            xw = xbuf[j % 2]  # (n_x, W, K) bf16
            y_add = _spmm_chunk(ebuf[j % 2, 0], ebuf[j % 2, 1],
                                vbuf[j % 2], xw, W, exact)
            acc[...] = acc[...] + y_add

        @pl.when(active & (meta_ref[j, 3] == 1))
        def _():
            w = pltpu.make_async_copy(acc, y_any.at[meta_ref[j, 0]], ysem)
            w.start()
            w.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "exact", "tail_grids")
)
def paged_spmm_sparse(
    layout: PagedEdges,
    x: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    exact: bool = False,
    tail_grids: tuple[int, ...] | None = None,
):
    """Frontier-sparse Y = A.X over a PagedEdges layout — same contract
    as spmm.bucketed_spmm_sparse."""
    from gunrock_tpu.ops.pallas.semiring import _TAIL_GRIDS
    from gunrock_tpu.ops.pallas.spmm import _split_bf16

    W, C, PAGE = layout.window, layout.chunk, layout.page
    S = W // 128
    V = layout.n_vertices
    K = x.shape[1]
    if layout.n_chunks == 0:
        return jnp.zeros((V, K), jnp.float32)

    meta, count, rb_touched = _sparse_meta(layout, active, out_mask)
    # K padded to a 128-lane multiple: manual x/y DMAs must slice
    # tile-aligned trailing dims (same real-chip Mosaic constraint as
    # paged_spmm above; the tiled layout pads the lanes anyway)
    Kp = -(-K // 128) * 128
    x_pad = jnp.zeros(
        (layout.n_col_blocks * W, Kp), jnp.float32
    ).at[:V, :K].set(x)
    if exact:
        x3 = x_pad.astype(jnp.bfloat16).reshape(
            layout.n_col_blocks, 1, W, Kp
        )
    else:
        xh, xl = _split_bf16(x_pad)
        x3 = jnp.stack(
            [xh.reshape(layout.n_col_blocks, W, Kp),
             xl.reshape(layout.n_col_blocks, W, Kp)], axis=1
        )
    n_x = 1 if exact else 2

    def call(n_pages):
        return pl.pallas_call(
            _make_paged_spmm_sparse_kernel(S, C, PAGE, Kp, exact),
            out_shape=jax.ShapeDtypeStruct(
                (layout.n_row_blocks, W, Kp), jnp.float32
            ),
            grid=(n_pages, PAGE),
            in_specs=[
                pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, n_x, W, Kp), jnp.bfloat16),
                pltpu.VMEM((2, 2, C // 128, 128), jnp.int32),
                pltpu.VMEM((2, C // 128, 128), jnp.float32),
                pltpu.VMEM((W, Kp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                has_side_effects=True,
            ),
            interpret=interpret,
        )(meta, layout.rowcol, layout.values, x3)

    tg = _TAIL_GRIDS if tail_grids is None else tail_grids
    n_pages = layout.n_pages
    grids = sorted({max(1, n_pages // g) for g in tg} | {n_pages})
    pages_needed = (count + PAGE - 1) // PAGE

    def dispatch(idx):
        if idx == len(grids) - 1:
            return lambda: call(grids[idx])
        return lambda: jax.lax.cond(
            pages_needed <= grids[idx], lambda: call(grids[idx]),
            dispatch(idx + 1),
        )

    y3 = dispatch(0)()
    y3 = jnp.where(rb_touched[:, None, None], y3, 0.0)
    return y3.reshape(-1, Kp)[:V, :K]


def _make_paged_minmax_kernel(S: int, C: int, PAGE: int):
    """Fused max/positives-min sparse paged kernel (Luby coloring's
    paired neighbor scan — semiring._sparse_minmax_kernel's math over
    the paged sparse structure; two accumulators, two outputs)."""
    W = S * 128

    def kernel(meta_ref, rc_any, val_any, x_any, ymax_any, ymin_any,
               xbuf, ebuf, vbuf, accx, accn, xsem, esem, vsem, ysem):
        j = pl.program_id(1)

        def dmas(jj, slot):
            return (
                pltpu.make_async_copy(
                    x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
                ),
                pltpu.make_async_copy(
                    rc_any.at[meta_ref[jj, 5]], ebuf.at[slot], esem.at[slot]
                ),
                pltpu.make_async_copy(
                    val_any.at[meta_ref[jj, 5]], vbuf.at[slot], vsem.at[slot]
                ),
            )

        def start(jj, slot):
            a, b, c = dmas(jj, slot)
            a.start()
            b.start()
            c.start()

        @pl.when((j == 0) & (meta_ref[0, 4] == 1))
        def _():
            start(0, 0)

        jn = jnp.minimum(j + 1, PAGE - 1)

        @pl.when((j + 1 < PAGE) & (meta_ref[jn, 4] == 1))
        def _():
            start(jn, (j + 1) % 2)

        active = meta_ref[j, 4] == 1

        @pl.when(active & (meta_ref[j, 2] == 1))
        def _():
            accx[...] = jnp.zeros_like(accx)
            accn[...] = jnp.full_like(accn, _BIG)

        @pl.when(active)
        def _():
            from gunrock_tpu.ops.pallas.semiring import _minmax_chunk_v4

            a, b, c = dmas(j, j % 2)
            a.wait()
            b.wait()
            c.wait()
            ax, an = _minmax_chunk_v4(
                xbuf[j % 2], ebuf[j % 2, 0], ebuf[j % 2, 1],
                vbuf[j % 2], S,
            )
            accx[...] = jnp.maximum(accx[...], ax)
            accn[...] = jnp.minimum(accn[...], an)

        @pl.when(active & (meta_ref[j, 3] == 1))
        def _():
            rb = meta_ref[j, 0]
            w1 = pltpu.make_async_copy(accx, ymax_any.at[rb], ysem)
            w1.start()
            w1.wait()
            w2 = pltpu.make_async_copy(accn, ymin_any.at[rb], ysem)
            w2.start()
            w2.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tail_grids"))
def paged_semiring_spmv_sparse_minmax(
    layout: PagedEdges,
    x: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
):
    """Fused (y_max, y_min) over a PagedEdges layout — same contract as
    semiring.bucketed_semiring_spmv_sparse_minmax."""
    from gunrock_tpu.ops.pallas.semiring import _TAIL_GRIDS

    W, C, PAGE = layout.window, layout.chunk, layout.page
    S = W // 128
    V = layout.n_vertices
    if layout.n_chunks == 0:
        return jnp.zeros(V, jnp.float32), jnp.full(V, _BIG, jnp.float32)

    meta, count, rb_touched = _sparse_meta(layout, active, out_mask)
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)

    def call(n_pages):
        return pl.pallas_call(
            _make_paged_minmax_kernel(S, C, PAGE),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (layout.n_row_blocks, S, 128), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (layout.n_row_blocks, S, 128), jnp.float32
                ),
            ),
            grid=(n_pages, PAGE),
            in_specs=[
                pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, S, 128), jnp.float32),
                pltpu.VMEM((2, 2, C // 128, 128), jnp.int32),
                pltpu.VMEM((2, C // 128, 128), jnp.float32),
                pltpu.VMEM((S, 128), jnp.float32),
                pltpu.VMEM((S, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                has_side_effects=True,
            ),
            interpret=interpret,
        )(meta, layout.rowcol, layout.values, x3)

    tg = _TAIL_GRIDS if tail_grids is None else tail_grids
    n_pages = layout.n_pages
    grids = sorted({max(1, n_pages // g) for g in tg} | {n_pages})
    pages_needed = (count + PAGE - 1) // PAGE

    def dispatch(idx):
        if idx == len(grids) - 1:
            return lambda: call(grids[idx])
        return lambda: jax.lax.cond(
            pages_needed <= grids[idx], lambda: call(grids[idx]),
            dispatch(idx + 1),
        )

    ymax3, ymin3 = dispatch(0)()
    ymax3 = jnp.where(rb_touched[:, None, None], ymax3, 0.0)
    ymin3 = jnp.where(rb_touched[:, None, None], ymin3, _BIG)
    return ymax3.reshape(-1)[:V], ymin3.reshape(-1)[:V]


# ---------------------------------------------------------------------------
# Snake-order kernel (round 4): the v5 dense pass is DMA/pipeline-bound
# (probe_v5_floor: 8.5 of 13.0 ms is block streaming at ~27 GB/s — the
# x window is re-fetched for every chunk). Iterating chunks as
# (rb_tile, cb, rb) with G = `group` live accumulators fetches each x
# window ONCE per tile instead of once per chunk: x traffic drops ~G x
# for bucket-saturated graphs. Output rides ANY space with manual
# run-end writebacks exactly like the paged kernels (the SMEM-grid
# pipeline cannot revisit an output block non-consecutively).


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["meta", "rowcol", "values", "rb_occupied"],
    meta_fields=["window", "chunk", "page", "group", "n_pages", "n_chunks",
                 "n_row_blocks", "n_col_blocks", "n_vertices"],
)
@dataclasses.dataclass(frozen=True)
class SnakeEdges:
    """PagedEdges in snake order. meta fields per chunk:
    [rb, cb, fetch_x, xslot, acc_init, acc_flush, g, 0] where g = the
    accumulator index of rb within its tile and fetch_x marks the first
    chunk of each (tile, cb) run (host-computed alternating xslot)."""

    meta: jax.Array  # int32[n_pages*page, 8]
    rowcol: jax.Array  # int32[n_pad, 2, chunk//128, 128]
    values: jax.Array  # f32[n_pad, chunk//128, 128]
    rb_occupied: jax.Array  # bool[n_row_blocks]
    window: int
    chunk: int
    page: int
    group: int
    n_pages: int
    n_chunks: int
    n_row_blocks: int
    n_col_blocks: int
    n_vertices: int


def build_snake_layout(
    rows, cols, values, n_vertices: int,
    window: int = 2048, chunk: int = 256, page: int = 512,
    group: int = 8, pad_value: float = 0.0,
) -> SnakeEdges:
    """Host-side: bucketed layout re-ordered (rb//G, cb, rb%G)."""
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout

    b = build_bucketed_layout(
        rows, cols, values, n_vertices,
        window=window, chunk=chunk, pad_value=pad_value,
    )
    n_chunks = b.n_chunks
    G = group
    rb = np.asarray(b.chunk_rb, np.int64)
    cb = np.asarray(b.chunk_cb, np.int64)
    order = np.lexsort((rb % G, cb, rb // G))
    rb_o = rb[order].astype(np.int32)
    cb_o = cb[order].astype(np.int32)
    tile = rb_o // G

    n_pages = max(1, -(-n_chunks // page))
    n_pad = n_pages * page
    meta = np.zeros((n_pad, 8), np.int32)
    if n_chunks:
        fetch = np.ones(n_chunks, np.int32)
        fetch[1:] = ((cb_o[1:] != cb_o[:-1])
                     | (tile[1:] != tile[:-1])).astype(np.int32)
        xslot = (np.cumsum(fetch) - 1) % 2
        key = tile.astype(np.int64) * (rb.max() + 2) + rb_o
        first = np.ones(n_chunks, np.int32)
        last = np.ones(n_chunks, np.int32)
        seen: dict = {}
        # first/last occurrence of each (tile, rb) in snake order
        first[1:] = 0
        last[:-1] = 0
        uk, inv = np.unique(key, return_inverse=True)
        first_idx = np.full(uk.size, n_chunks, np.int64)
        last_idx = np.zeros(uk.size, np.int64)
        np.minimum.at(first_idx, inv, np.arange(n_chunks))
        np.maximum.at(last_idx, inv, np.arange(n_chunks))
        first = np.zeros(n_chunks, np.int32)
        last = np.zeros(n_chunks, np.int32)
        first[first_idx] = 1
        last[last_idx] = 1
        meta[:n_chunks, 0] = rb_o
        meta[:n_chunks, 1] = cb_o
        meta[:n_chunks, 2] = fetch
        meta[:n_chunks, 3] = xslot
        meta[:n_chunks, 4] = first
        meta[:n_chunks, 5] = last
        meta[:n_chunks, 6] = (rb_o % G).astype(np.int32)

    assert chunk % 128 == 0
    cr = chunk // 128
    rl = np.asarray(b.row_local).reshape(n_chunks, cr, 128)[order]
    cl = np.asarray(b.col_local).reshape(n_chunks, cr, 128)[order]
    vals = np.asarray(b.values).reshape(n_chunks, cr, 128)[order]
    rowcol = np.zeros((n_pad, 2, cr, 128), np.int32)
    rowcol[:n_chunks, 0] = rl
    rowcol[:n_chunks, 1] = cl
    vpad = np.full((n_pad, cr, 128), pad_value, np.float32)
    vpad[:n_chunks] = vals
    return SnakeEdges(
        meta=jnp.asarray(meta), rowcol=jnp.asarray(rowcol),
        values=jnp.asarray(vpad), rb_occupied=b.rb_occupied,
        window=window, chunk=chunk, page=page, group=G,
        n_pages=n_pages, n_chunks=n_chunks,
        n_row_blocks=b.n_row_blocks, n_col_blocks=b.n_col_blocks,
        n_vertices=n_vertices,
    )


def _make_snake_kernel(semiring: str, S: int, C: int, PAGE: int, G: int):
    ident, _ = _SEMIRINGS[semiring]

    def kernel(meta_ref, rc_ref, val_ref, x_any, y_any, xbuf, acc, xsem,
               ysem):
        j = pl.program_id(1)

        def x_dma(jj, slot):
            return pltpu.make_async_copy(
                x_any.at[meta_ref[jj, 1]], xbuf.at[slot], xsem.at[slot]
            )

        @pl.when((j == 0) & (meta_ref[0, 2] == 1))
        def _():
            x_dma(0, meta_ref[0, 3]).start()

        jn = jnp.minimum(j + 1, PAGE - 1)

        @pl.when((j + 1 < PAGE) & (meta_ref[jn, 2] == 1))
        def _():
            x_dma(jn, meta_ref[jn, 3]).start()

        rb = meta_ref[j, 0]
        g = meta_ref[j, 6]

        @pl.when(meta_ref[j, 4] == 1)
        def _():
            acc[g] = jnp.full((S, 128), ident, jnp.float32)

        @pl.when(meta_ref[j, 2] == 1)
        def _():
            x_dma(j, meta_ref[j, 3]).wait()

        x2 = xbuf[meta_ref[j, 3]]
        y_add = _chunk_compute(
            semiring, rc_ref[0, 0], rc_ref[0, 1], val_ref[0], x2, S
        )
        if semiring == "min_plus":
            acc[g] = jnp.minimum(acc[g], y_add)
        elif semiring == "max_times":
            acc[g] = jnp.maximum(acc[g], y_add)
        else:
            acc[g] = acc[g] + y_add

        @pl.when(meta_ref[j, 5] == 1)
        def _():
            w = pltpu.make_async_copy(acc.at[g], y_any.at[rb], ysem)
            w.start()
            w.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("semiring", "interpret"))
def snake_semiring_spmv(
    layout: SnakeEdges,
    x: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
):
    """Dense semiring advance over a SnakeEdges layout — identical
    result contract to semiring.bucketed_semiring_spmv."""
    W, C, PAGE, G = layout.window, layout.chunk, layout.page, layout.group
    S = W // 128
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)

    y3 = pl.pallas_call(
        _make_snake_kernel(semiring, S, C, PAGE, G),
        out_shape=jax.ShapeDtypeStruct(
            (layout.n_row_blocks, S, 128), jnp.float32
        ),
        grid=(layout.n_pages, PAGE),
        in_specs=[
            pl.BlockSpec((PAGE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0, 0)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda i, j: (i * PAGE + j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, S, 128), jnp.float32),  # x double buffer
            pltpu.VMEM((G, S, 128), jnp.float32),  # per-tile accumulators
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(layout.meta, layout.rowcol, layout.values, x3)
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, ident)
    y = y3.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y
