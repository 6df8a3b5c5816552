"""Uniquify: frontier deduplication.

Role of reference include/gunrock/framework/operators/uniquify/
(uniquify.hxx:27-94): optional radix sort + ``thrust::unique``; a
``best_effort`` mode skips the sort and dedups only adjacent runs.

TPU redesign: the default ``SCATTER`` strategy dedups *exactly* via a
one-hot scatter into a dense mask and re-compaction — cheaper than sort on
TPU and strictly better than the reference's "best effort" heuristic
(which exists only because a full sort was too expensive on GPU). The
``UNIQUE`` strategy (sort + adjacent-unique) is kept for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from gunrock_tpu.ops.configs import UniquifyAlgorithm
from gunrock_tpu.utils.limits import INVALID_VERTEX, is_valid


def uniquify(
    data,
    count,
    n_vertices: int,
    algorithm: UniquifyAlgorithm = UniquifyAlgorithm.SCATTER,
    best_effort: bool = False,
):
    """Deduplicate a padded queue frontier. Returns ``(data, count)``."""
    capacity = data.shape[0]
    live = (jnp.arange(capacity, dtype=count.dtype) < count) & is_valid(data)

    if algorithm == UniquifyAlgorithm.SCATTER:
        # Exact dedup: mark presence, then keep only the first occurrence.
        slot = jnp.full(n_vertices, capacity, dtype=jnp.int32)
        idx = jnp.arange(capacity, dtype=jnp.int32)
        safe = jnp.where(live, data, 0)
        slot = slot.at[safe].min(jnp.where(live, idx, capacity))
        keep = live & (slot[safe] == idx)
    else:
        # Sort + adjacent-unique (reference unique.hxx). Padding sorts to
        # the end because INVALID (-1)... sorts first for signed ints, so
        # replace padding with a +inf-like key.
        big = jnp.iinfo(data.dtype).max
        keyed = jnp.where(live, data, big)
        if best_effort and algorithm == UniquifyAlgorithm.UNIQUE:
            sorted_data = keyed  # best-effort: skip the sort
        else:
            sorted_data = jnp.sort(keyed)
        prev = jnp.concatenate(
            [jnp.full(1, INVALID_VERTEX, dtype=data.dtype), sorted_data[:-1]]
        )
        keep = (sorted_data != prev) & (sorted_data != big)
        data = jnp.where(sorted_data == big, INVALID_VERTEX, sorted_data)

    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.where(capacity > 0, pos[-1] + 1, 0).astype(count.dtype)
    out = jnp.full(capacity, INVALID_VERTEX, dtype=data.dtype)
    scatter_idx = jnp.where(keep, pos, capacity)
    out = out.at[scatter_idx].set(data, mode="drop")
    return out, new_count
