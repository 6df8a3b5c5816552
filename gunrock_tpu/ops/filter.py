"""Filter: predicate-driven frontier pruning.

Role of reference include/gunrock/framework/operators/filter/filter.hxx
with its strategy variants:

- ``bypass`` (bypass.hxx:13-69) — mark failures invalid *in place*, no
  compaction. For a dense mask frontier this is a plain mask AND — the
  natural TPU default (no data movement at all).
- ``predicated``/``remove`` (predicated.hxx, remove.hxx) — compaction into
  a new dense queue. On TPU this is an exact-size-bounded cumsum scatter,
  replacing ``thrust::copy_if``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gunrock_tpu.utils.limits import INVALID_VERTEX, is_valid


def filter_mask(frontier_mask, pred_mask):
    """Bypass filter over a dense mask frontier: keep where pred holds."""
    return frontier_mask & pred_mask


def filter_queue(
    data,
    count,
    pred: Callable,
    compact: bool = True,
):
    """Filter a padded queue frontier.

    ``data`` is ``int32[capacity]`` padded with the invalid sentinel,
    ``count`` the live prefix length. ``pred(items) -> bool`` is evaluated
    vectorized over the whole buffer; invalid entries are always dropped
    (reference filter semantics, filter.hxx:17-30).

    With ``compact=False`` this is the bypass strategy (in-place sentinel
    marking, O(1) size change, supports input==output —
    bypass.hxx:62-69). With ``compact=True`` survivors are packed to the
    front via an exclusive cumsum scatter and the new count returned.
    """
    capacity = data.shape[0]
    in_range = jnp.arange(capacity, dtype=count.dtype) < count
    keep = in_range & is_valid(data) & pred(data)

    if not compact:
        new_data = jnp.where(keep, data, INVALID_VERTEX)
        return new_data, count

    # Exclusive cumsum gives each survivor its output slot.
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.where(capacity > 0, pos[-1] + 1, 0).astype(count.dtype)
    out = jnp.full(capacity, INVALID_VERTEX, dtype=data.dtype)
    scatter_idx = jnp.where(keep, pos, capacity)  # dropped -> OOB (ignored)
    out = out.at[scatter_idx].set(data, mode="drop")
    return out, new_count
