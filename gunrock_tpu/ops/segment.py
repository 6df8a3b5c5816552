"""Sorted-segment reductions tuned for TPU.

``jax.ops.segment_*`` lowers to scatter, which XLA serializes on TPU for
duplicate indices (measured ~0.1 Gelem/s). For *sorted* segments — the
CSR/CSC orderings every operator uses — a sum is a cumulative-sum
difference at the segment offsets (prefix scan + two gathers, ~5-10x
faster). Min/max have no subtraction inverse and stay on the scatter
path (or the Pallas semiring kernels for the hot loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_sum_sorted(values: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-segment sums of ``values`` split by ``offsets`` (int32[S+1]).

    ``values`` must be ordered by segment (CSR/CSC edge order).

    Precision note: the global f32 prefix carries the *total* magnitude;
    per-segment results inherit ~ulp(total) absolute error. Fine for
    normalized quantities (ranks, probabilities, int counts); for sums of
    large-magnitude floats (coordinates, raw products) use
    ``jax.ops.segment_sum`` (exact per-segment accumulation) instead —
    see algorithms/geo.py and spgemm.py."""
    ce = jnp.concatenate(
        [jnp.zeros((1,) + values.shape[1:], values.dtype),
         jnp.cumsum(values, axis=0)]
    )
    return ce[offsets[1:]] - ce[offsets[:-1]]


def seg_count_sorted(mask: jax.Array, offsets: jax.Array) -> jax.Array:
    """Per-segment True counts (int32)."""
    return seg_sum_sorted(mask.astype(jnp.int32), offsets)
