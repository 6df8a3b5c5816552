"""Semiring SpMV Pallas kernel family: the unified TPU advance.

One bucketed windowed kernel, parameterized by semiring, is the whole
load-balanced advance family (the role the reference spreads across
thread_mapped/block_mapped/merge_path kernels + per-algorithm atomics,
reference operators/advance/merge_path_v2.hxx:75-244):

- ``plus_times``  y[r] = sum_e  val_e * x[col_e]   — SpMV, PageRank spread
- ``min_plus``    y[r] = min_e (val_e + x[col_e])  — SSSP relaxation
- ``max_times``   y[r] = max_e  val_e * x[col_e]   — reachability (BFS)

Five kernel versions, selectable via GUNROCK_SEMIRING_KERNEL / the
``version`` kwarg (chip history in BASELINE.md):

- **v1** flat [C, W] one-hot compare/select/reduce (rounds 1-3 default).
- **v2/v3** two-level MXU / sub-block streaming — round-2 negative
  results, kept for A/B.
- **v4** (round 4) gather via ``tpu.dynamic_gather``: per x sub-block a
  broadcast + 128-lane hardware permute + select (~3·W/128 lane-ops/edge
  instead of ~3·W; see _gather_window_dyn); v1-style one-hot scatter.
- **v5 = default**: v4 gather + MXU one-hot scatter for plus_times
  ([S,C] x [C,128] bf16 hi+lo matmuls; ``exact=True`` single-matmul for
  bf16-exact 0/1 messages — sums stay exact, the MXU accumulates f32).
  min/max fall back to the v4 scatter (min is not a matmul).

Padding slots carry the reduction identity so they vanish; accumulation
across chunks of the same row window happens in VMEM. Edge metadata for
v4/v5 rides HOST-tiled as [Cr, 128] (in-kernel [C] <-> [Cr, 128]
reshapes are Mosaic "unsupported shape cast"s — docs/design.md §15).
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


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_kernel_v3(semiring: str):
    """Sub-block streaming kernel: every intermediate stays [C, 128].

    The v1 kernel materializes [C, W] compare/select/reduce tensors
    (2 MB each at C=256, W=2048) — VMEM-bandwidth-bound. v3 statically
    unrolls over the S = W/128 sub-blocks: per step a [C]-wide compare on
    the hi bits and a [C, 128] masked select, so the working set fits in
    vector registers. Same ALU count, ~16x less VMEM traffic."""
    ident, _ = _SEMIRINGS[semiring]

    def kernel(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        S = x_ref.shape[-2]  # W // 128
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        col = col_ref[0, 0, :]
        row = row_ref[0, 0, :]
        val = val_ref[0, 0, :]
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
        col_hi = col // 128
        col_lo = col - col_hi * 128
        row_hi = row // 128
        row_lo = row - row_hi * 128

        # ---- gather: per sub-block broadcast-select, [C, 128] tiles ----
        x = x_ref[0]  # [S, 128]
        if S == 1:
            rows = jnp.broadcast_to(x[0][None, :], (C, 128))
        else:
            # NB: reshape the int32 THEN compare — Mosaic cannot insert a
            # minor dim on 1-bit (bool) vectors.
            col_hi2 = col_hi[:, None]
            rows = jnp.zeros((C, 128), jnp.float32)
            for s in range(S):
                rows = rows + jnp.where(col_hi2 == s, x[s][None, :], 0.0)
        xg = jnp.sum(jnp.where(col_lo[:, None] == lo_iota, rows, 0.0), axis=1)

        if semiring == "min_plus":
            msg = jnp.minimum(val + xg, _BIG)
        else:
            msg = val * xg

        # ---- scatter: lo one-hot once, then per sub-block masked reduce ----
        lo_scat = jnp.where(row_lo[:, None] == lo_iota, msg[:, None], ident)
        if semiring == "plus_times":
            red, comb = jnp.sum, None
        elif semiring == "min_plus":
            red, comb = jnp.min, jnp.minimum
        else:
            red, comb = jnp.max, jnp.maximum
        row_hi2 = row_hi[:, None]
        parts = []
        for s in range(S):
            sel = (
                lo_scat
                if S == 1
                else jnp.where(row_hi2 == s, lo_scat, ident)
            )
            parts.append(red(sel, axis=0))
        y_new = parts[0][None, :] if S == 1 else jnp.stack(parts, axis=0)
        if semiring == "plus_times":
            y_ref[0] = y_ref[0] + y_new
        else:
            y_ref[0] = comb(y_ref[0], y_new)

    return kernel


def _make_kernel_v2(semiring: str):
    ident, _ = _SEMIRINGS[semiring]

    def kernel(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        S = x_ref.shape[-2]  # W // 128 sub-blocks
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        col = col_ref[0, 0, :]
        row = row_ref[0, 0, :]
        val = val_ref[0, 0, :]
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)

        # ---- gather xg[c] = x[col[c]] : hi via MXU, lo via VPU select ----
        x = x_ref[0]  # [S, 128] f32
        if S == 1:
            rows = jnp.broadcast_to(x[0][None, :], (C, 128))
        else:
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
            hi_mask = ((col // 128)[:, None] == hi_iota).astype(jnp.bfloat16)
            xh, xl = _split_bf16(x)
            rows = jnp.dot(
                hi_mask, xh, preferred_element_type=jnp.float32
            ) + jnp.dot(hi_mask, xl, preferred_element_type=jnp.float32)
        col_lo = col - (col // 128) * 128
        xg = jnp.sum(jnp.where(col_lo[:, None] == lo_iota, rows, 0.0), axis=1)

        # ---- message per semiring ----
        if semiring == "min_plus":
            msg = jnp.minimum(val + xg, _BIG)
        else:
            msg = val * xg

        # ---- scatter-reduce into the y window ----
        row_hi = row // 128
        row_lo = row - row_hi * 128
        if semiring == "plus_times":
            lo_scat = jnp.where(row_lo[:, None] == lo_iota, msg[:, None], 0.0)
            if S == 1:
                y_ref[0] = y_ref[0] + jnp.sum(lo_scat, axis=0)[None, :]
            else:
                mh, ml = _split_bf16(lo_scat)
                s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, C), 0)
                hi_t = (row_hi[None, :] == s_iota).astype(jnp.bfloat16)
                y_add = jnp.dot(
                    hi_t, mh, preferred_element_type=jnp.float32
                ) + jnp.dot(hi_t, ml, preferred_element_type=jnp.float32)
                y_ref[0] = y_ref[0] + y_add
        else:
            # min/max: VPU one-hot select per 128-lane sub-block (static
            # unroll over S keeps everything 2-D — no Mosaic reshapes).
            comb = jnp.minimum if semiring == "min_plus" else jnp.maximum
            red = jnp.min if semiring == "min_plus" else jnp.max
            lo_scat = jnp.where(row_lo[:, None] == lo_iota, msg[:, None], ident)
            parts = []
            for s in range(S):
                sel = jnp.where(row_hi[:, None] == s, lo_scat, ident)
                parts.append(red(sel, axis=0))
            y_new = parts[0][None, :] if S == 1 else jnp.stack(parts, axis=0)
            y_ref[0] = comb(y_ref[0], y_new)

    return kernel


def _make_kernel_v1(semiring: str):
    """Flat [C, W] one-hot kernel (original). Kept for A/B measurement."""
    ident, _ = _SEMIRINGS[semiring]

    def kernel(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        S = x_ref.shape[-2]
        W = S * 128
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
        col = col_ref[0, 0, :]
        row = row_ref[0, 0, :]
        val = val_ref[0, 0, :]
        xf = x_ref[0].reshape(1, W)
        xg = jnp.sum(jnp.where(col[:, None] == lanes, xf, 0.0), axis=1)
        if semiring == "min_plus":
            msg = jnp.minimum(val + xg, _BIG)
            scat = jnp.where(row[:, None] == lanes, msg[:, None], _BIG)
            y_add = jnp.min(scat, axis=0).reshape(S, 128)
            y_ref[0] = jnp.minimum(y_ref[0], y_add)
        elif semiring == "max_times":
            msg = val * xg
            scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
            y_add = jnp.max(scat, axis=0).reshape(S, 128)
            y_ref[0] = jnp.maximum(y_ref[0], y_add)
        else:
            msg = val * xg
            scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
            y_add = jnp.sum(scat, axis=0).reshape(S, 128)
            y_ref[0] = y_ref[0] + y_add

    return kernel


def _gather_window_dyn(x2, col2, S: int):
    """xg tile = x2[col // 128, col % 128] via per-vreg dynamic gather.

    jax 0.9 Mosaic lowers ``take_along_axis(a, i, axis=1)`` with
    ``a.shape == i.shape`` to ``tpu.dynamic_gather`` — a 128-lane
    hardware permute (one vreg per op; "Multiple source vregs along
    gather dimension" is the documented limit, probed on chip in
    benchmarks/probe_gather*.py). Gathering C window values therefore
    costs ~3*S lane-ops/edge (S = W/128 broadcast+permute+select steps)
    instead of the flat one-hot's ~3*W — a ~128x reduction of the
    round-3 compare-op wall (VERDICT weak #2). Edges ride as
    [C//128, 128] tiles end to end (in-kernel [C] <-> [Cr, 128]
    reshapes are Mosaic "unsupported shape cast"s — the HOST reshapes
    the metadata blocks instead)."""
    Cr = col2.shape[0]
    hi = col2 // 128
    lo = col2 - hi * 128
    acc = jnp.zeros((Cr, 128), jnp.float32)
    for s in range(S):
        g = jnp.take_along_axis(
            jnp.broadcast_to(x2[s][None, :], (Cr, 128)), lo, axis=1
        )
        acc = g if S == 1 else jnp.where(hi == s, g, acc)
    return acc


def _scatter_window_pure(row2, msg2, semiring: str, S: int, mxu: bool,
                         exact: bool = False):
    """y_add [S, 128] = scatter-reduce of msg by local row id — the pure
    form shared by the SMEM-grid kernels (which combine into y_ref) and
    the paged kernels (which combine into a VMEM run accumulator).

    ``row2``/``msg2`` arrive as [Cr, 128] tiles; each tile row (128
    edges) scatters separately (static unroll keeps every slice a
    natural 1-D lane vector — no shape casts).

    ``mxu=False``: the v1 flat [128, W] compare/select/reduce (~3*W
    lane-ops/edge, works for any semiring). ``mxu=True`` (plus_times
    only): lo-level one-hot expand [128, 128] then hi-level one-hot
    matmul on the MXU (~2*128 lane-ops/edge + [S,128]x[128,128]
    matmuls); bf16 hi+lo split keeps ~f32 accuracy."""
    ident, _ = _SEMIRINGS[semiring]
    W = S * 128
    Cr = row2.shape[0]
    if mxu and semiring == "plus_times":
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        # batch the per-tile [S,128]x[128,128] matmuls into ONE
        # [S, C]x[C, 128] pair: sublane-concat of the lo one-hots is a
        # register relabel, and one big contraction amortizes MXU
        # latency over the whole chunk
        scats = []
        hi_ts = []
        for cr in range(Cr):
            row = row2[cr]
            msg = msg2[cr]
            rhi = row // 128
            rlo = row - rhi * 128
            scats.append(
                jnp.where(rlo[:, None] == lo_iota, msg[:, None], 0.0)
            )
            hi_ts.append((rhi[None, :] == s_iota).astype(jnp.bfloat16))
        lo_scat = scats[0] if Cr == 1 else jnp.concatenate(scats, axis=0)
        hi_t = hi_ts[0] if Cr == 1 else jnp.concatenate(hi_ts, axis=1)
        if exact:
            # messages are bf16-exact small values (|m| <= 256 integral,
            # e.g. 0/1 reachability) — one matmul, no hi/lo split; the
            # MXU still accumulates in f32 so SUMS stay exact to 2^24
            return jnp.dot(hi_t, lo_scat.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        mh, ml = _split_bf16(lo_scat)
        return jnp.dot(
            hi_t, mh, preferred_element_type=jnp.float32
        ) + jnp.dot(hi_t, ml, preferred_element_type=jnp.float32)
    # per-(sub-block, tile) [128, 128] scats reduced with keepdims and
    # sublane-concatenated: the obvious [128, W] reduce + [W]->[S, 128]
    # reshape is an "unsupported shape cast" on real Mosaic when S < 16
    # (measured 2026-08-19: W=512 fails, W=2048 compiles) — keeping every
    # intermediate 2-D sidesteps the 1-D relayout entirely at identical
    # op count
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    if semiring == "min_plus":
        red, comb = jnp.min, jnp.minimum
    elif semiring == "max_times":
        red, comb = jnp.max, jnp.maximum
    else:
        red, comb = jnp.sum, jnp.add
    parts = []
    for s in range(S):
        acc_s = None
        for cr in range(Cr):
            scat = jnp.where(
                (row2[cr][:, None] - s * 128) == lanes,
                msg2[cr][:, None], ident,
            )
            r = red(scat, axis=0, keepdims=True)
            acc_s = r if acc_s is None else comb(acc_s, r)
        parts.append(acc_s)
    return parts[0] if S == 1 else jnp.concatenate(parts, axis=0)


def _compute_chunk_v4(x2, row2, col2, val2, semiring: str, S: int,
                      mxu: bool, exact: bool = False):
    """Whole-chunk v4/v5 advance (gather + message + scatter), pure:
    returns y_add [S, 128] to combine into the caller's accumulator.
    Shared by the SMEM-grid kernels and the paged kernels."""
    xg = _gather_window_dyn(x2, col2, S)
    if semiring == "min_plus":
        msg2 = jnp.minimum(val2 + xg, _BIG)
    else:
        msg2 = val2 * xg
    return _scatter_window_pure(row2, msg2, semiring, S, mxu, exact)


def _scatter_window(row2, msg2, y_ref, semiring: str, S: int, mxu: bool,
                    exact: bool = False):
    """Ref-combining wrapper over :func:`_scatter_window_pure`."""
    y_add = _scatter_window_pure(row2, msg2, semiring, S, mxu, exact)
    if semiring == "min_plus":
        y_ref[0] = jnp.minimum(y_ref[0], y_add)
    elif semiring == "max_times":
        y_ref[0] = jnp.maximum(y_ref[0], y_add)
    else:
        y_ref[0] = y_ref[0] + y_add


def _minmax_chunk_v4(x2, row2, col2, val2, S: int):
    """Whole-chunk fused (max, positives-min) v4 advance, pure: returns
    (ymax_add, ymin_add), each [S, 128]. Dynamic-gather input side; the
    min/max scatter stays a one-hot (no MXU form exists for min).
    Shared by the SMEM-grid minmax kernel and the paged variant."""
    Cr = row2.shape[0]
    xg = _gather_window_dyn(x2, col2, S)
    msg2 = val2 * xg
    msgm2 = jnp.where(msg2 > 0.0, msg2, _BIG)
    # all-2-D scatter (see _scatter_window_pure: [W]->[S,128] reshapes
    # are unsupported shape casts on real Mosaic for small S); the
    # onehot compare is shared by both reductions per (s, cr) tile
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    px, pn = [], []
    for s in range(S):
        ax = an = None
        for cr in range(Cr):
            onehot = (row2[cr][:, None] - s * 128) == lanes
            mx = jnp.max(
                jnp.where(onehot, msg2[cr][:, None], 0.0),
                axis=0, keepdims=True,
            )
            mn = jnp.min(
                jnp.where(onehot, msgm2[cr][:, None], _BIG),
                axis=0, keepdims=True,
            )
            ax = mx if ax is None else jnp.maximum(ax, mx)
            an = mn if an is None else jnp.minimum(an, mn)
        px.append(ax)
        pn.append(an)
    accx = px[0] if S == 1 else jnp.concatenate(px, axis=0)
    accn = pn[0] if S == 1 else jnp.concatenate(pn, axis=0)
    return accx, accn


def _make_kernel_v4(semiring: str, mxu_scatter: bool = False,
                    unit: bool = False):
    """Dynamic-gather kernel: the gather side rides tpu.dynamic_gather
    (~3*S ops/edge, see _gather_window_dyn); the scatter side stays the
    v1 one-hot (v4) or rides the MXU for plus_times (v5). Edge metadata
    blocks arrive TILED as [1, C//128, 128] (host-side reshape in
    _bucketed_semiring_spmv_impl).

    ``unit=True`` (round 5): the VALUES stream is dropped entirely —
    the layout must carry all-1 values (unit layouts) and padding is
    dropped by the row sentinel (row_local == window), cutting the
    per-edge metadata DMA from 12 to 8 bytes on the dense floor
    (VERDICT r4 weak #4: passes are DMA-bound at ~30%% of stream)."""
    ident, _ = _SEMIRINGS[semiring]

    def compute(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        i = pl.program_id(0)
        S = x_ref.shape[-2]
        first_visit = jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        col2 = col_ref[0]  # [Cr, 128]
        row2 = row_ref[0]
        xg = _gather_window_dyn(x_ref[0], col2, S)
        if val_ref is None:
            msg2 = jnp.minimum(xg, _BIG) if semiring == "min_plus" else xg
        elif semiring == "min_plus":
            msg2 = jnp.minimum(val_ref[0] + xg, _BIG)
        else:
            msg2 = val_ref[0] * xg
        _scatter_window(row2, msg2, y_ref, semiring, S, mxu_scatter)

    if unit:

        def kernel(pk_ref, x_ref, row_ref, col_ref, y_ref):
            compute(pk_ref, x_ref, row_ref, col_ref, None, y_ref)

        return kernel

    def kernel(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref):
        compute(pk_ref, x_ref, row_ref, col_ref, val_ref, y_ref)

    return kernel


def _make_kernel_v5(semiring: str):
    return _make_kernel_v4(semiring, mxu_scatter=True)


_KERNELS = {
    1: _make_kernel_v1,
    2: _make_kernel_v2,
    3: _make_kernel_v3,
    4: _make_kernel_v4,
    5: _make_kernel_v5,
}


def _default_version() -> int:
    """v5 (dynamic-gather + MXU scatter) measured on the v5 lite chip
    (s18 R-MAT degsort, W=2048, C=256, same-session A/B 2026-08-19):
    plus_times v1 76.2 ms -> v4 15.4 -> v5 13.2 (vs best-ever recorded
    v1 41.5 ms: 3.1x); min_plus v1 28.9 -> v4 15.5 (1.9x; min cannot
    ride the MXU so v5 falls back to the v4 scatter there). The jax-0.9
    tpu.dynamic_gather lowering (take_along_axis within one vreg) is
    what obsoleted the round-2 negative results for v2/v3 — those
    predate it and remain selectable for A/B via
    GUNROCK_SEMIRING_KERNEL."""
    import os

    return int(os.environ.get("GUNROCK_SEMIRING_KERNEL", "5"))


def bucketed_semiring_spmv(
    layout: BucketedEdges,
    x: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
    version: int | None = None,
    unit: bool = False,
):
    """Generalized y = A (x) over the bucketed layout. For ``min_plus``
    the layout must be built with ``pad_value=inf`` (see
    ``layout_for_graph``); results >= _BIG mean 'no edge' (+inf).

    ``unit=True``: the layout's values are all 1 (unit layouts) and the
    values stream is skipped entirely — 8 instead of 12 bytes/edge on
    the DMA-bound dense floor. Requires version >= 4 (silently ignored
    below; paged layouts keep their valued path for now).

    ``version`` (or GUNROCK_SEMIRING_KERNEL) is resolved OUTSIDE the jit
    cache: with the env read inside a trace keyed on version=None, an
    in-process A/B that flips the env var between calls would silently
    reuse the first executable.

    Accepts a :class:`~gunrock_tpu.ops.pallas.paged.PagedEdges` layout
    too (the big-graph paged-metadata form, GUNROCK_PAGED_META) — every
    caller inherits the paged kernel transparently."""
    from gunrock_tpu.ops.pallas.paged import PagedEdges, paged_semiring_spmv

    if isinstance(layout, PagedEdges):
        return paged_semiring_spmv(layout, x, semiring, interpret=interpret)
    if version is None:
        version = _default_version()
    return _bucketed_semiring_spmv_impl(
        layout, x, semiring, interpret, version, unit and version >= 4
    )


@functools.partial(
    jax.jit, static_argnames=("semiring", "interpret", "version", "unit")
)
def _bucketed_semiring_spmv_impl(
    layout: BucketedEdges,
    x: jax.Array,
    semiring: str,
    interpret: bool,
    version: int,
    unit: bool = False,
):
    W, C = layout.window, layout.chunk
    assert W % 128 == 0, "window must be a multiple of 128"
    S = W // 128
    n_chunks = layout.n_chunks
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    x_pad = jnp.full(layout.n_col_blocks * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(layout.n_col_blocks, S, 128)
    # v4/v5 (dynamic-gather kernels) take edge metadata TILED as
    # [Cr, 128] — in-kernel [C] <-> [Cr, 128] reshapes are Mosaic
    # "unsupported shape cast"s, so the host reshapes here instead.
    if version >= 4:
        mshape = (n_chunks, C // 128, 128)
    else:
        mshape = (n_chunks, 1, C)
    row2 = layout.row_local.reshape(mshape)
    col2 = layout.col_local.reshape(mshape)

    # single PACKED metadata array (rb*65536 + cb): SMEM scalar-prefetch
    # is capped at 1 MB, and n_chunks can reach ~125K at scale 20 — one
    # int32[n_chunks] operand instead of two halves the footprint
    pk = layout.chunk_rb * 65536 + layout.chunk_cb
    mblock = (1,) + mshape[1:]
    meta_spec = pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0))
    in_specs = [
        pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i] % 65536, 0, 0)),
        meta_spec,
        meta_spec,
    ]
    operands = [pk, x3, row2, col2]
    if unit:
        kernel = _make_kernel_v4(semiring, version >= 5, unit=True)
    else:
        in_specs.append(meta_spec)
        operands.append(layout.values.reshape(mshape))
        kernel = _KERNELS[version](semiring)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, 128), lambda i, pk: (pk[i] // 65536, 0, 0)
        ),
    )
    y3 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((layout.n_row_blocks, S, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    # Row windows no chunk maps to are never written by the kernel —
    # replace their (uninitialized) contents with the semiring identity.
    y3 = jnp.where(layout.rb_occupied[:, None, None], y3, ident)
    y = y3.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y


def _make_sparse_kernel(semiring: str, version: int = 1,
                        exact: bool = False, unit: bool = False):
    """Flat kernel with in-grid chunk skipping: grid slot i runs chunk
    ``perm[i]`` when ``i < count`` and does nothing otherwise. The
    frontier-driven advance of the reference's sparse input frontiers
    (merge_path_v2.hxx operates on compacted frontiers; here the
    compaction is a device-side stable selection of ACTIVE CHUNKS and
    the work skip happens through the scalar-prefetched permutation).

    ``version >= 4``: dynamic-gather variant (edge metadata tiled
    [Cr, 128], see _gather_window_dyn / _scatter_window; v5 = MXU
    scatter for plus_times)."""
    ident, _ = _SEMIRINGS[semiring]

    def body(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
             val_ref, y_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        S = x_ref.shape[-2]
        W = S * 128
        active = i < cnt_ref[0]
        first_visit = active & jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y_ref[...] = jnp.full_like(y_ref, ident)

        @pl.when(active)
        def _():
            if version >= 4:
                col2 = col_ref[0]
                row2 = row_ref[0]
                xg = _gather_window_dyn(x_ref[0], col2, S)
                if val_ref is None:
                    msg2 = (
                        jnp.minimum(xg, _BIG)
                        if semiring == "min_plus" else xg
                    )
                elif semiring == "min_plus":
                    msg2 = jnp.minimum(val_ref[0] + xg, _BIG)
                else:
                    msg2 = val_ref[0] * xg
                _scatter_window(
                    row2, msg2, y_ref, semiring, S, version >= 5, exact
                )
                return
            lanes = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
            col = col_ref[0, 0, :]
            row = row_ref[0, 0, :]
            val = val_ref[0, 0, :]
            xf = x_ref[0].reshape(1, W)
            xg = jnp.sum(jnp.where(col[:, None] == lanes, xf, 0.0), axis=1)
            if semiring == "min_plus":
                msg = jnp.minimum(val + xg, _BIG)
                scat = jnp.where(row[:, None] == lanes, msg[:, None], _BIG)
                y_add = jnp.min(scat, axis=0).reshape(S, 128)
                y_ref[0] = jnp.minimum(y_ref[0], y_add)
            elif semiring == "max_times":
                msg = val * xg
                scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
                y_add = jnp.max(scat, axis=0).reshape(S, 128)
                y_ref[0] = jnp.maximum(y_ref[0], y_add)
            else:
                msg = val * xg
                scat = jnp.where(row[:, None] == lanes, msg[:, None], 0.0)
                y_add = jnp.sum(scat, axis=0).reshape(S, 128)
                y_ref[0] = y_ref[0] + y_add

    if unit:
        assert version >= 4, "unit kernels need the tiled v4+ metadata"

        def kernel(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
                   y_ref):
            body(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
                 None, y_ref)

        return kernel

    def kernel(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
               val_ref, y_ref):
        body(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
             val_ref, y_ref)

    return kernel


def _sparse_chunk_select(layout: BucketedEdges, active, out_mask):
    """Device-side active-chunk selection shared by every frontier-sparse
    kernel (SpMV, minmax, SpMM): a chunk runs iff one of its real edges'
    SOURCE sub-blocks (window/32 vertices) holds an ``active`` vertex and
    (when given) one of its DEST sub-blocks holds an ``out_mask`` vertex
    — the per-chunk ``src_bits``/``dst_bits`` occupancy words built by
    the layout give 64-vertex activity resolution instead of the window
    (2048+), which under degree sort stops one peeled/active hub vertex
    from false-activating every chunk of the hub window.
    Returns (ch_act, pk_r, perm, count)."""
    W = layout.window
    n_chunks = layout.n_chunks
    n_cb = layout.n_col_blocks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices
    bit_w = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)

    act_pad = jnp.zeros(n_cb * W, bool).at[:V].set(active)
    act_blk = jnp.any(act_pad.reshape(n_cb, 32, W // 32), axis=2)
    act_words = jnp.sum(
        jnp.where(act_blk, bit_w, jnp.uint32(0)), axis=1, dtype=jnp.uint32
    )
    if out_mask is not None:
        om_pad = jnp.zeros(n_rb * W, bool).at[:V].set(out_mask)
        om_blk = jnp.any(om_pad.reshape(n_rb, 32, W // 32), axis=2)
        om_words = jnp.sum(
            jnp.where(om_blk, bit_w, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
    else:
        om_words = act_words  # ignored (masked=False)
    # per-chunk word test via the Pallas small-table dynamic gather —
    # the XLA form (`act_words[layout.chunk_cb] & ...`) serializes at
    # ~7.4 ns/chunk and was the dominant per-wave floor of the peel /
    # label loops (round-5 k-core trace; ops/pallas/chunkplan.py)
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.chunkplan import chunk_activity

    ch_act = chunk_activity(
        act_words, om_words, layout.chunk_cb, layout.chunk_rb,
        layout.src_bits, layout.dst_bits,
        masked=out_mask is not None, interpret=use_interpret(),
    )
    count = jnp.sum(ch_act.astype(jnp.int32))
    # active-first compaction as ONE stable 1-key sort carrying BOTH the
    # chunk id (-> perm) and the packed rb|cb metadata (-> pk_r): the
    # former scatter-compact + packed[perm] gather pair serialized at
    # ~7.4 ns/chunk each (~1.5 ms/wave at s20's 123K chunks — the
    # round-5 k-core trace's top two fusions). Stability keeps active
    # chunks in (rb, cb) order, which the output-block revisit logic
    # requires.
    packed = layout.chunk_rb * 65536 + layout.chunk_cb
    _, perm, pk_r = jax.lax.sort(
        (
            (~ch_act).astype(jnp.int32),
            jnp.arange(n_chunks, dtype=jnp.int32),
            packed,
        ),
        num_keys=1, is_stable=True,
    )
    # Inactive tail slots (i >= count) must alias the LAST active chunk,
    # not chunk 0: TPU output blocks are not read back from HBM on
    # revisit, so a tail slot pointing at an earlier row block would
    # flush the stale VMEM buffer over rows already computed. Extending
    # the final contiguous run means the end-of-grid flush rewrites the
    # (already correct) last block. count==0 leaves the aliases at slot
    # 0; the undefined flush lands on a block rb_touched masks out.
    tail_i = jnp.maximum(count - 1, 0)
    in_range = jnp.arange(n_chunks, dtype=jnp.int32) < count
    perm = jnp.where(in_range, perm, perm[tail_i])
    pk_r = jnp.where(in_range, pk_r, pk_r[tail_i])
    return ch_act, pk_r, perm, count


def _rb_touched(layout: BucketedEdges, ch_act):
    """bool[n_rb]: row blocks holding >=1 ACTIVE chunk — via cumsum
    difference over the rb-sorted chunk order (chunks are built sorted
    by (rb, cb)), replacing a per-chunk scatter that serialized at
    ~0.8 ms/wave at s20 (round-5 k-core trace)."""
    cs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(ch_act.astype(jnp.int32))]
    )
    bounds = jnp.searchsorted(
        layout.chunk_rb,
        jnp.arange(layout.n_row_blocks + 1, dtype=jnp.int32),
    )
    return jnp.diff(cs[bounds]) > 0


def _sparse_chunk_plan(layout: BucketedEdges, x, active, out_mask,
                       version: int = 1, unit: bool = False):
    """Shared device-side active-chunk selection + operand packing for
    the frontier-sparse kernels (spmv_sparse and sparse_minmax must stay
    byte-identical here — any divergence silently changes which chunks
    run). Returns (ch_act, call_args, in_specs, out_block_spec).
    ``version >= 4`` tiles the edge metadata as [Cr, 128] for the
    dynamic-gather kernels."""
    W, C = layout.window, layout.chunk
    S = W // 128
    n_chunks = layout.n_chunks
    n_cb = layout.n_col_blocks
    V = layout.n_vertices

    ch_act, pk_r, perm, count = _sparse_chunk_select(layout, active, out_mask)

    x_pad = jnp.full(n_cb * W, 0.0, jnp.float32).at[:V].set(x)
    x3 = x_pad.reshape(n_cb, S, 128)
    if version >= 4:
        mshape = (n_chunks, C // 128, 128)
    else:
        mshape = (n_chunks, 1, C)
    row2 = layout.row_local.reshape(mshape)
    col2 = layout.col_local.reshape(mshape)
    mblock = (1,) + mshape[1:]
    meta_spec = pl.BlockSpec(mblock, lambda i, pk, pm, ct: (pm[i], 0, 0))
    call_args = (pk_r, perm, count.reshape(1), x3, row2, col2)
    in_specs = [
        pl.BlockSpec((1, S, 128), lambda i, pk, pm, ct: (pk[i] % 65536, 0, 0)),
        meta_spec,
        meta_spec,
    ]
    if not unit:
        call_args = call_args + (layout.values.reshape(mshape),)
        in_specs.append(meta_spec)
    out_block = pl.BlockSpec(
        (1, S, 128), lambda i, pk, pm, ct: (pk[i] // 65536, 0, 0)
    )
    return ch_act, call_args, in_specs, out_block


def bucketed_semiring_spmv_sparse(
    layout: BucketedEdges,
    x: jax.Array,
    active: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
    version: int | None = None,
    exact: bool = False,
    unit: bool = False,
):
    if version is None:
        version = _default_version()
    return _bucketed_semiring_spmv_sparse_impl(
        layout, x, active, semiring, interpret, out_mask, tail_grids,
        version, exact, unit and version >= 4,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "semiring", "interpret", "tail_grids", "version", "exact", "unit"
    ),
)
def _bucketed_semiring_spmv_sparse_impl(
    layout: BucketedEdges,
    x: jax.Array,
    active: jax.Array,
    semiring: str = "plus_times",
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
    version: int = 1,
    exact: bool = False,
    unit: bool = False,
):
    """Frontier-sparse semiring advance: identical result contract to
    :func:`bucketed_semiring_spmv` given that inactive vertices of ``x``
    already carry the gather identity — but chunks whose source window
    contains NO active vertex are skipped inside the grid, so per-
    iteration cost tracks the frontier's spread instead of O(E).
    ``active``: bool[V] mask of vertices whose x participates.
    ``out_mask``: optional bool[V] mask of OUTPUT vertices the caller will
    read — chunks whose destination window contains no masked vertex are
    also skipped, and those rows return the semiring identity (direction-
    optimized BFS's late levels: most vertices already reached, their
    pull rows never recomputed).

    Accepts a PagedEdges layout (GUNROCK_PAGED_META) transparently."""
    from gunrock_tpu.ops.pallas.paged import (PagedEdges,
                                              paged_semiring_spmv_sparse)

    if isinstance(layout, PagedEdges):
        return paged_semiring_spmv_sparse(
            layout, x, active, semiring, interpret=interpret,
            out_mask=out_mask, tail_grids=tail_grids, exact=exact,
        )
    W = layout.window
    S = W // 128
    n_chunks = layout.n_chunks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices
    ident, _ = _SEMIRINGS[semiring]
    if n_chunks == 0:
        # edgeless layout: the selection below would index an empty
        # cumsum; every row is the identity
        fill = jnp.inf if semiring == "min_plus" else ident
        return jnp.full(V, fill, jnp.float32)

    ch_act, call_args, in_specs, out_block = _sparse_chunk_plan(
        layout, x, active, out_mask, version, unit
    )
    count = call_args[2][0]
    y3 = _tail_grid_dispatch(
        _make_sparse_kernel(semiring, version, exact, unit),
        jax.ShapeDtypeStruct((n_rb, S, 128), jnp.float32),
        in_specs, out_block, call_args, count, n_chunks, interpret,
        tail_grids,
    )
    # dynamic occupancy: row windows touched by >=1 ACTIVE chunk
    rb_touched = _rb_touched(layout, ch_act)
    y3 = jnp.where(rb_touched[:, None, None], y3, ident)
    y = y3.reshape(-1)[:V]
    if semiring == "min_plus":
        y = jnp.where(y >= _BIG, jnp.inf, y)
    return y


def _tail_grids_env():
    """Grid divisors for the collapsed-frontier dispatch, resolved at
    import (A/B between settings = separate processes, as all axon
    benchmarking already is). Default OFF since the round-3 chip A/Bs
    (results_r2c/r3b 2026-08-19): the lax.cond dispatch taxes every
    call ~3-5% (BFS s18 75.2 vs 72.3 MTEPS, SSSP 106.6 vs 110.2 ms,
    k-core s16 765 vs 801 ms) and only wave-heavy peels at scale win
    (k-core s18 2916 vs 3433 ms = +15%) — so algorithms that profit opt
    in per call via the ``tail_grids`` kwarg (k-core size-gated, greedy
    coloring) and GUNROCK_TAIL_GRIDS sets the process-wide default for
    A/Bs."""
    import os

    raw = os.environ.get("GUNROCK_TAIL_GRIDS", "").strip()
    if not raw or raw == "0":
        return ()
    return tuple(
        g for g in (int(t) for t in raw.split(",") if t.strip()) if g > 1
    )


_TAIL_GRIDS = _tail_grids_env()


def _tail_grid_dispatch(
    kernel, out_shape, in_specs, out_specs, call_args, count, n_chunks,
    interpret, tail_grids=None,
):
    """Run ``kernel`` over the smallest compiled grid holding ``count``
    active chunks (nested lax.cond — the untaken branch genuinely does
    not execute on TPU). Iterating 10k+ predicated-off grid slots is the
    measured ~3 ms per-round floor of the frontier-sparse kernels on
    collapsed frontiers (k-core peel tails, coloring stragglers, BFS/SSSP
    late levels); the n_chunks//8 and //64 variants cut it ~8/64x."""

    def call(grid):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(grid,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            interpret=interpret,
        )(*call_args)

    tg = _TAIL_GRIDS if tail_grids is None else tail_grids
    grids = sorted({max(1, n_chunks // g) for g in tg} | {n_chunks})

    def dispatch(idx):
        if idx == len(grids) - 1:
            return lambda: call(grids[idx])
        return lambda: jax.lax.cond(
            count <= grids[idx], lambda: call(grids[idx]), dispatch(idx + 1)
        )

    return dispatch(0)()


def _sparse_minmax_kernel(version: int = 1):
    """Fused max/min kernel (chunk-skipping): one windowed one-hot gather
    feeds BOTH a max-reduce (identity 0) and a positives-only min-reduce
    (identity _BIG) — the [C, W] compare, the dominant VPU cost, is paid
    once instead of twice. Built for coloring's paired neighbor scans
    (reference color.hxx:116-140: nbr max and min of uncolored randoms).
    ``version >= 4``: dynamic-gather input side (tiled metadata); the
    min/max scatter stays a one-hot (no MXU form exists for min)."""

    def kernel(pk_ref, perm_ref, cnt_ref, x_ref, row_ref, col_ref,
               val_ref, ymax_ref, ymin_ref):
        i = pl.program_id(0)
        C = row_ref.shape[-1]
        S = x_ref.shape[-2]
        W = S * 128
        active = i < cnt_ref[0]
        first_visit = active & jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            ymax_ref[...] = jnp.zeros_like(ymax_ref)
            ymin_ref[...] = jnp.full_like(ymin_ref, _BIG)

        @pl.when(active)
        def _():
            if version >= 4:
                accx, accn = _minmax_chunk_v4(
                    x_ref[0], row_ref[0], col_ref[0], val_ref[0], S
                )
                ymax_ref[0] = jnp.maximum(ymax_ref[0], accx)
                ymin_ref[0] = jnp.minimum(ymin_ref[0], accn)
                return
            lanes = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
            col = col_ref[0, 0, :]
            row = row_ref[0, 0, :]
            val = val_ref[0, 0, :]
            xf = x_ref[0].reshape(1, W)
            xg = jnp.sum(jnp.where(col[:, None] == lanes, xf, 0.0), axis=1)
            msg = val * xg  # 0 for pad slots (val=0) and inactive x (x=0)
            onehot = row[:, None] == lanes
            scat_max = jnp.where(onehot, msg[:, None], 0.0)
            ymax_ref[0] = jnp.maximum(
                ymax_ref[0], jnp.max(scat_max, axis=0).reshape(S, 128)
            )
            msgm = jnp.where(msg > 0.0, msg, _BIG)
            scat_min = jnp.where(onehot, msgm[:, None], _BIG)
            ymin_ref[0] = jnp.minimum(
                ymin_ref[0], jnp.min(scat_min, axis=0).reshape(S, 128)
            )

    return kernel


def bucketed_semiring_spmv_sparse_minmax(
    layout: BucketedEdges,
    x: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
    version: int | None = None,
):
    if version is None:
        version = _default_version()
    return _bucketed_minmax_impl(
        layout, x, active, interpret, out_mask, tail_grids, version
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "tail_grids", "version")
)
def _bucketed_minmax_impl(
    layout: BucketedEdges,
    x: jax.Array,
    active: jax.Array,
    interpret: bool = False,
    out_mask: jax.Array | None = None,
    tail_grids: tuple[int, ...] | None = None,
    version: int = 1,
):
    """Fused (y_max, y_min) = (max_e val*x[col_e], min over POSITIVE
    val*x[col_e]) with the same chunk-skipping contract as
    :func:`bucketed_semiring_spmv_sparse`. ``y_min`` rows with no positive
    contribution return ``_BIG``. Requires x >= 0 (0 = inactive)."""
    from gunrock_tpu.ops.pallas.paged import (
        PagedEdges, paged_semiring_spmv_sparse_minmax)

    if isinstance(layout, PagedEdges):
        return paged_semiring_spmv_sparse_minmax(
            layout, x, active, interpret=interpret, out_mask=out_mask,
            tail_grids=tail_grids,
        )
    W = layout.window
    S = W // 128
    n_chunks = layout.n_chunks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices
    if n_chunks == 0:
        return (
            jnp.zeros(V, jnp.float32),
            jnp.full(V, _BIG, jnp.float32),
        )

    ch_act, call_args, in_specs, out_block = _sparse_chunk_plan(
        layout, x, active, out_mask, version
    )
    ymax3, ymin3 = _tail_grid_dispatch(
        _sparse_minmax_kernel(version),
        (
            jax.ShapeDtypeStruct((n_rb, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rb, S, 128), jnp.float32),
        ),
        in_specs, (out_block, out_block), call_args, call_args[2][0],
        n_chunks, interpret, tail_grids,
    )
    rb_touched = _rb_touched(layout, ch_act)
    ymax3 = jnp.where(rb_touched[:, None, None], ymax3, 0.0)
    ymin3 = jnp.where(rb_touched[:, None, None], ymin3, _BIG)
    return ymax3.reshape(-1)[:V], ymin3.reshape(-1)[:V]


def push_layout(
    graph,
    window: int | None = None,
    chunk: int | None = None,
    pad_value: float = 0.0,
    unit: bool = False,
    interpret: bool | None = None,
):
    """Bucketed layout of the CSR edge set (rows=src, cols=dst): push
    advance — y[src] = reduce over out-edges of f(x[dst], w). Cached per
    graph with the same contract as :func:`pull_layout`."""
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import (
        build_auto_layout,
        build_bucketed_layout,
        cached_layout,
    )

    if interpret is None:
        interpret = use_interpret()

    def build():
        rows = hostcache.host(graph, "edge_src")
        cols = hostcache.host(graph, "col_indices")
        vals = (
            np.ones(graph.n_edges, np.float32)
            if unit
            else hostcache.host(graph, "values")
        )
        if window is None or chunk is None:
            return build_auto_layout(
                rows, cols, vals, graph.n_vertices, pad_value=pad_value,
                interpret=interpret,
            )
        return build_bucketed_layout(
            rows, cols, vals, graph.n_vertices,
            window=window, chunk=chunk, pad_value=pad_value,
        )

    return cached_layout(
        graph.col_indices,
        build,
        ("push", window, chunk, pad_value, unit),
    )


def pull_layout(
    graph,
    window: int | None = None,
    chunk: int | None = None,
    pad_value: float = 0.0,
    unit: bool = False,
    interpret: bool | None = None,
):
    """Bucketed layout of the TRANSPOSED edge set (rows=dst, cols=src):
    pull advance — y[dst] = reduce over in-edges of f(x[src], w).
    ``unit=True`` replaces edge weights with 1.0 (unweighted semirings,
    e.g. BFS reachability). Cached per graph (weakref-validated, dies
    with the graph). Window/chunk default to the SMEM-safe chunk-count
    escalation (layout.build_auto_layout)."""
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import (
        build_auto_layout,
        build_bucketed_layout,
        cached_layout,
    )

    if interpret is None:
        interpret = use_interpret()

    def build():
        rows = hostcache.host(graph, "col_indices")  # rows = destinations
        cols = hostcache.host(graph, "edge_src")  # cols = sources
        vals = (
            np.ones(graph.n_edges, np.float32)
            if unit
            else hostcache.host(graph, "values")
        )
        if window is None or chunk is None:
            return build_auto_layout(
                rows, cols, vals, graph.n_vertices, pad_value=pad_value,
                interpret=interpret,
            )
        return build_bucketed_layout(
            rows, cols, vals, graph.n_vertices,
            window=window, chunk=chunk, pad_value=pad_value,
        )

    return cached_layout(
        graph.col_indices,
        build,
        ("pull", window, chunk, pad_value, unit),
    )
