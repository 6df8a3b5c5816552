"""Binary search support.

Role of reference search/binary_search.hxx:43-60 (device binary search
used by block_mapped advance and ``get_edge``): vectorized
``searchsorted`` plus the fixed-trip-count bounded search for use inside
``vmap``/``while_loop`` bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_search(sorted_arr, needles, side: str = "left"):
    """Vectorized lower/upper bound over a sorted array."""
    return jnp.searchsorted(sorted_arr, needles, side=side).astype(jnp.int32)


def bounded_binary_search(arr, needle, lo, hi, steps: int = 32):
    """Lower bound of ``needle`` within ``arr[lo:hi]`` with a fixed trip
    count (jit/vmap-safe; reference search::binary::execute semantics)."""

    def body(_, state):
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) // 2
        go_right = arr[jnp.minimum(mid, arr.shape[0] - 1)] < needle
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        return jnp.where(active, new_lo, lo), jnp.where(active, new_hi, hi)

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo
