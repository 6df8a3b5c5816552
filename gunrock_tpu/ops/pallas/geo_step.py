"""Pallas kernel for geolocation's Weiszfeld step (round 4).

The geo inner loop (reference geo.hxx:131-238; gunrock_tpu
algorithms/geo.py wstep) was the framework's slowest recorded row
(24.3 s at s16): every step paid an [E, 2] serialized gather of the
current iterate plus an [E, 4] serialized scatter-sum (~0.1 Gelem/s
each on this chip). This kernel moves the whole step into the bucketed
machinery:

- edges bucketed by OWNER row (src) exactly like push_layout; the
  per-edge neighbor coordinates (mlat/mlon, fixed per OUTER iteration)
  ride as [Cr, 128] tile operands;
- the current iterate (y_lat/y_lon) is gathered from the chunk's ROW
  window via tpu.dynamic_gather (the v4 gather over row_local);
- haversine runs per-edge on the VPU — Mosaic has sin/cos/sqrt but NO
  asin/atan (probed 2026-08-19), so arcsin is the Cephes asinf
  polynomial (|err| < 1e-6 over [0, 1], test-pinned);
- the 4 reduction channels (nonzero count, dinv, dinv*mlat, dinv*mlon)
  share one hi-level MXU one-hot scatter: the lo one-hots concatenate
  along the output lane axis ([C, 4*128]) so one bf16 matmul pair
  scatters all four.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrock_tpu.ops.pallas.layout import BucketedEdges
from gunrock_tpu.ops.pallas.semiring import (_gather_window_dyn,
                                             _split_bf16)

_PI_2 = 1.5707963267948966


def _asin_poly(x):
    """float32 arcsin on [0, 1] (Cephes asinf): x + x*z*P(z) for
    x <= 0.5, else pi/2 - 2*asin(sqrt((1-x)/2)). Branch-free select."""
    x = jnp.clip(x, 0.0, 1.0)
    big = x > 0.5
    z_small = x * x
    z_big = 0.5 * (1.0 - x)
    s_big = jnp.sqrt(z_big)
    z = jnp.where(big, z_big, z_small)
    v = jnp.where(big, s_big, x)
    p = (
        ((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2)
        * z
        + 7.4953002686e-2
    ) * z + 1.6666752422e-1
    r = v + v * z * p
    return jnp.where(big, _PI_2 - 2.0 * r, r)


def _haversine_tiled(lat1, lon1, lat2, lon2, radius=6371.0):
    """Great-circle distance on [Cr, 128] tiles (degrees in, km out) —
    same math as algorithms.geo.haversine with the polynomial asin."""
    rad = jnp.float32(jnp.pi / 180.0)
    la1, lo1 = lat1 * rad, lon1 * rad
    la2, lo2 = lat2 * rad, lon2 * rad
    sdlat = jnp.sin((la2 - la1) * 0.5)
    sdlon = jnp.sin((lo2 - lo1) * 0.5)
    a = sdlat * sdlat + jnp.cos(la1) * jnp.cos(la2) * sdlon * sdlon
    return radius * 2.0 * _asin_poly(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))


def _wstep_compute(row2, ylat_ref, ylon_ref, mlat_ref, mlon_ref, ok_ref,
                   y4_ref, S):
    """Shared chunk body of the dense and sparse Weiszfeld-step kernels:
    gather the iterate, haversine, 4-channel shared MXU scatter."""
    Cr = row2.shape[0]
    ylg = _gather_window_dyn(ylat_ref[0], row2, S)
    yog = _gather_window_dyn(ylon_ref[0], row2, S)
    mlat2 = mlat_ref[0]
    mlon2 = mlon_ref[0]
    ok2 = ok_ref[0]  # 1.0 valid / 0.0 pad-or-unlabeled

    d = _haversine_tiled(mlat2, mlon2, ylg, yog)
    ok = (ok2 > 0.0) & (d != 0.0)
    dinv = jnp.where(ok, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    ch = (
        ok.astype(jnp.float32),  # nonzero count
        dinv,
        dinv * mlat2,
        dinv * mlon2,
    )

    # shared hi-level MXU scatter: lo one-hots of the 4 channels
    # concatenated along the OUTPUT lane axis -> one matmul pair
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    scats = []
    hi_ts = []
    for cr in range(Cr):
        row = row2[cr]
        rhi = row // 128
        rlo = row - rhi * 128
        eq = rlo[:, None] == lo_iota
        scats.append(jnp.concatenate(
            [jnp.where(eq, c[cr][:, None], 0.0) for c in ch], axis=1
        ))  # [128, 4*128]
        hi_ts.append((rhi[None, :] == s_iota).astype(jnp.bfloat16))
    lo_scat = scats[0] if Cr == 1 else jnp.concatenate(scats, axis=0)
    hi_t = hi_ts[0] if Cr == 1 else jnp.concatenate(hi_ts, axis=1)
    mh, ml = _split_bf16(lo_scat)
    y4_ref[0] = y4_ref[0] + jnp.dot(
        hi_t, mh, preferred_element_type=jnp.float32
    ) + jnp.dot(hi_t, ml, preferred_element_type=jnp.float32)


def _make_wstep_kernel(S: int):
    def kernel(pk_ref, ylat_ref, ylon_ref, row_ref, mlat_ref, mlon_ref,
               ok_ref, y4_ref):
        i = pl.program_id(0)
        first_visit = jnp.logical_or(
            i == 0, pk_ref[i] != pk_ref[jnp.maximum(i - 1, 0)]
        )

        @pl.when(first_visit)
        def _():
            y4_ref[...] = jnp.zeros_like(y4_ref)

        _wstep_compute(row_ref[0], ylat_ref, ylon_ref, mlat_ref, mlon_ref,
                       ok_ref, y4_ref, S)

    return kernel


def _make_wstep_sparse_kernel(S: int):
    """Chunk-skipping Weiszfeld-step kernel: slots past the active count
    are predicated off entirely (the tail-slot permutation aliases the
    LAST active chunk, so the end-of-grid flush rewrites an already-
    correct block — semiring._sparse_chunk_select's contract)."""

    def kernel(pk_ref, perm_ref, cnt_ref, ylat_ref, ylon_ref, row_ref,
               mlat_ref, mlon_ref, ok_ref, y4_ref):
        i = pl.program_id(0)
        active = i < cnt_ref[0]
        first_visit = active & jnp.logical_or(
            i == 0,
            pk_ref[i] // 65536 != pk_ref[jnp.maximum(i - 1, 0)] // 65536,
        )

        @pl.when(first_visit)
        def _():
            y4_ref[...] = jnp.zeros_like(y4_ref)

        @pl.when(active)
        def _():
            _wstep_compute(row_ref[0], ylat_ref, ylon_ref, mlat_ref,
                           mlon_ref, ok_ref, y4_ref, S)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def weiszfeld_step_sums(
    layout: BucketedEdges,
    y_lat: jax.Array,  # f32[V] current iterate
    y_lon: jax.Array,
    mlat3: jax.Array,  # f32[n_chunks, Cr, 128] slot-space neighbor lat
    mlon3: jax.Array,
    ok3: jax.Array,  # f32[n_chunks, Cr, 128] 1.0 = labeled real edge
    interpret: bool = False,
):
    """One Weiszfeld step's segmented sums, all four channels:
    (nonzeros, dinv_sum, dinv*mlat sum, dinv*mlon sum), each f32[V]."""
    W, C = layout.window, layout.chunk
    S = W // 128
    n_chunks = layout.n_chunks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices

    def pad3(v):
        p = jnp.zeros(n_rb * W, jnp.float32).at[:V].set(v)
        return p.reshape(n_rb, S, 128)

    ylat3 = pad3(y_lat)
    ylon3 = pad3(y_lon)
    row2 = layout.row_local.reshape(n_chunks, C // 128, 128)
    pk = layout.chunk_rb

    mblock = (1, C // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i], 0, 0)),
            pl.BlockSpec((1, S, 128), lambda i, pk: (pk[i], 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
            pl.BlockSpec(mblock, lambda i, pk: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, 512), lambda i, pk: (pk[i], 0, 0)),
    )
    y4 = pl.pallas_call(
        _make_wstep_kernel(S),
        out_shape=jax.ShapeDtypeStruct((n_rb, S, 512), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pk, ylat3, ylon3, row2, mlat3, mlon3, ok3)
    y4 = jnp.where(layout.rb_occupied[:, None, None], y4, 0.0)
    chans = [
        y4[:, :, k * 128:(k + 1) * 128].reshape(-1)[:V] for k in range(4)
    ]
    return chans[0], chans[1], chans[2], chans[3]


@functools.partial(jax.jit, static_argnames=("interpret", "tail_grids"))
def weiszfeld_step_sums_sparse(
    layout: BucketedEdges,
    y_lat: jax.Array,
    y_lon: jax.Array,
    mlat3: jax.Array,
    mlon3: jax.Array,
    ok3: jax.Array,
    undone: jax.Array,  # bool[V] — rows still iterating
    interpret: bool = False,
    tail_grids: tuple[int, ...] | None = (2, 4, 8, 64),
):
    """Chunk-skipping Weiszfeld step: only chunks whose ROW sub-blocks
    hold an un-converged vertex run (dst_bits resolution, tail-grid
    dispatch). Rows outside ``undone``'s touched windows return 0 sums —
    the geo loop never reads them (done-masked updates). Stragglers
    converge over hundreds of steps while the undone set collapses, so
    late steps cost the /64 grid instead of the full pass."""
    from gunrock_tpu.ops.pallas.semiring import (_sparse_chunk_select,
                                                 _tail_grid_dispatch)

    W, C = layout.window, layout.chunk
    S = W // 128
    n_chunks = layout.n_chunks
    n_rb = layout.n_row_blocks
    V = layout.n_vertices

    ones = jnp.ones(V, bool)
    ch_act, pk_r, perm, count = _sparse_chunk_select(layout, ones, undone)

    def pad3(v):
        p = jnp.zeros(n_rb * W, jnp.float32).at[:V].set(v)
        return p.reshape(n_rb, S, 128)

    ylat3 = pad3(y_lat)
    ylon3 = pad3(y_lon)
    row2 = layout.row_local.reshape(n_chunks, C // 128, 128)

    mblock = (1, C // 128, 128)
    in_specs = [
        pl.BlockSpec((1, S, 128), lambda i, pk, pm, ct: (pk[i] // 65536, 0, 0)),
        pl.BlockSpec((1, S, 128), lambda i, pk, pm, ct: (pk[i] // 65536, 0, 0)),
        pl.BlockSpec(mblock, lambda i, pk, pm, ct: (pm[i], 0, 0)),
        pl.BlockSpec(mblock, lambda i, pk, pm, ct: (pm[i], 0, 0)),
        pl.BlockSpec(mblock, lambda i, pk, pm, ct: (pm[i], 0, 0)),
        pl.BlockSpec(mblock, lambda i, pk, pm, ct: (pm[i], 0, 0)),
    ]
    out_spec = pl.BlockSpec(
        (1, S, 512), lambda i, pk, pm, ct: (pk[i] // 65536, 0, 0)
    )
    call_args = (pk_r, perm, count.reshape(1), ylat3, ylon3, row2, mlat3,
                 mlon3, ok3)
    y4 = _tail_grid_dispatch(
        _make_wstep_sparse_kernel(S),
        jax.ShapeDtypeStruct((n_rb, S, 512), jnp.float32),
        in_specs, out_spec, call_args, count, n_chunks, interpret,
        tail_grids,
    )
    rb_touched = (
        jnp.zeros(n_rb, bool)
        .at[jnp.where(ch_act, layout.chunk_rb, n_rb)]
        .set(True, mode="drop")
    )
    y4 = jnp.where(rb_touched[:, None, None], y4, 0.0)
    chans = [
        y4[:, :, k * 128:(k + 1) * 128].reshape(-1)[:V] for k in range(4)
    ]
    return chans[0], chans[1], chans[2], chans[3]
