"""Active-chunk test for the frontier-sparse plan, as one Pallas call.

`semiring._sparse_chunk_select` tests every chunk's occupancy words
against the frontier's per-window activity words:

    ch_act[i] = (act_words[chunk_cb[i]] & src_bits[i]) != 0
                [& (om_words[chunk_rb[i]] & dst_bits[i]) != 0]

As XLA ops the two `words[chunk_*]` lookups are serialized gathers —
7.4 ns/element measured (k-core trace round 5: 2 x 152 us/round at s18's
20.5K chunks, ~2 x 1.9 ms/round at s20's 189K — the dominant share of
the per-wave floor that tail grids could not touch). The tables are
tiny (n_cb, n_rb <= 512 words at W=2048), so the whole test is a
perfect fit for the v4 dynamic-gather select tree: ~3 * ceil(n_cb/128)
lane-ops per chunk, one grid step for the entire plan.

Word tables ride as int32 (Mosaic gathers 32-bit lanes; the bitwise AND
is bit-identical under the int32 view)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_small(words_ref, idx2, steps: int):
    """out[r, l] = words[idx2[r, l]] for a <=128*steps-entry table."""
    R = idx2.shape[0]
    hi = idx2 // 128
    lo = idx2 - hi * 128
    acc = jnp.zeros((R, 128), jnp.int32)
    for s in range(steps):
        g = jnp.take_along_axis(
            jnp.broadcast_to(words_ref[s][None, :], (R, 128)), lo, axis=1
        )
        acc = g if steps == 1 else jnp.where(hi == s, g, acc)
    return acc


def _make_plan_kernel(steps_cb: int, steps_rb: int, masked: bool):
    def kernel(aw_ref, ow_ref, cb_ref, rb_ref, sb_ref, db_ref, out_ref):
        act = (
            _gather_small(aw_ref, cb_ref[...], steps_cb) & sb_ref[...]
        ) != 0
        if masked:
            act &= (
                _gather_small(ow_ref, rb_ref[...], steps_rb) & db_ref[...]
            ) != 0
        out_ref[...] = act.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("masked", "interpret")
)
def chunk_activity(
    act_words: jax.Array,  # uint32/int32[n_cb]
    om_words: jax.Array,  # uint32/int32[n_rb] (ignored unless masked)
    chunk_cb: jax.Array,  # int32[n_chunks]
    chunk_rb: jax.Array,
    src_bits: jax.Array,  # uint32[n_chunks]
    dst_bits: jax.Array,
    masked: bool,
    interpret: bool = False,
) -> jax.Array:
    """bool[n_chunks] active-chunk mask (the chunkplan docstring test)."""
    n = chunk_cb.shape[0]
    n_pad = -(-max(n, 1) // 128) * 128

    def pad_i32(a, fill=0):
        out = jnp.full(n_pad, fill, jnp.int32)
        return out.at[:n].set(a.astype(jnp.int32)).reshape(-1, 128)

    def pad_words(w):
        m = -(-max(w.shape[0], 1) // 128) * 128
        return (
            jnp.zeros(m, jnp.int32)
            .at[: w.shape[0]]
            .set(w.astype(jnp.int32))
            .reshape(-1, 128)
        )

    aw2 = pad_words(act_words)
    ow2 = pad_words(om_words)
    out = pl.pallas_call(
        _make_plan_kernel(aw2.shape[0], ow2.shape[0], masked),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(
        aw2, ow2, pad_i32(chunk_cb), pad_i32(chunk_rb),
        pad_i32(src_bits), pad_i32(dst_bits),
    )
    return out.reshape(-1)[:n] != 0
