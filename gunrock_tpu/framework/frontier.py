"""Frontier containers.

The reference's frontier is a device vector with a host-tracked element
count, over-allocated by a resizing factor and padded with invalid
sentinels (reference include/gunrock/framework/frontier/frontier.hxx:36-147,
vector_frontier.hxx:28-311). It also sketches an experimental dense
"boolmap" frontier (frontier/experimental/boolmap_frontier.hxx) that is
disabled.

On TPU both designs become first-class, and the *dense mask* is the
default: a ``bool[V]`` mask vectorizes perfectly, needs no compaction, no
capacity management, and no sentinel bookkeeping. The padded queue
(``QueueFrontier``) is kept for algorithms that genuinely need ordered
compact vertex lists and for API parity; its fixed capacity + count +
sentinel layout is exactly the reference's own design, which is already
XLA-shaped (static capacity, dynamic count).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.utils.limits import INVALID_VERTEX, is_valid


def queue_to_mask(data, count, n_vertices: int):
    """Scatter a padded queue into a dense bool mask."""
    capacity = data.shape[0]
    live = (jnp.arange(capacity) < count) & is_valid(data)
    safe = jnp.where(live, data, 0)
    mask = jnp.zeros(n_vertices, dtype=bool)
    return mask.at[safe].max(live)


def mask_to_queue(mask, capacity: int):
    """Compact a dense mask into a sorted padded queue. Returns (data, count)."""
    (data,) = jnp.nonzero(mask, size=capacity, fill_value=INVALID_VERTEX)
    return data.astype(jnp.int32), jnp.sum(mask).astype(jnp.int32)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mask"],
    meta_fields=[],
)
@dataclasses.dataclass
class DenseFrontier:
    """Dense vertex mask frontier — the TPU-native default."""

    mask: jax.Array  # bool[V]

    @staticmethod
    def empty(n_vertices: int) -> "DenseFrontier":
        return DenseFrontier(jnp.zeros(n_vertices, dtype=bool))

    @staticmethod
    def single(n_vertices: int, v) -> "DenseFrontier":
        return DenseFrontier(jnp.zeros(n_vertices, dtype=bool).at[v].set(True))

    @staticmethod
    def all(n_vertices: int) -> "DenseFrontier":
        return DenseFrontier(jnp.ones(n_vertices, dtype=bool))

    def get_number_of_elements(self) -> jax.Array:
        return jnp.sum(self.mask).astype(jnp.int32)

    def is_empty(self) -> jax.Array:
        return ~jnp.any(self.mask)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "count"],
    meta_fields=[],
)
@dataclasses.dataclass
class QueueFrontier:
    """Fixed-capacity padded vertex/edge queue with an invalid sentinel.

    Functional analog of the reference ``vector_frontier_t``
    (vector_frontier.hxx:28-311): ``data`` is ``int32[capacity]``, live
    elements occupy the prefix ``[0, count)``, dead slots hold
    ``INVALID_VERTEX``. All mutators return new frontiers.
    """

    data: jax.Array  # int32[capacity]
    count: jax.Array  # int32 scalar

    # -- construction ---------------------------------------------------
    @staticmethod
    def with_capacity(capacity: int) -> "QueueFrontier":
        return QueueFrontier(
            data=jnp.full(capacity, INVALID_VERTEX, dtype=jnp.int32),
            count=jnp.int32(0),
        )

    @staticmethod
    def from_list(items, capacity: int) -> "QueueFrontier":
        items = np.asarray(items, dtype=np.int32)
        data = np.full(capacity, INVALID_VERTEX, dtype=np.int32)
        data[: items.shape[0]] = items
        return QueueFrontier(jnp.asarray(data), jnp.int32(items.shape[0]))

    # -- accessors (vector_frontier.hxx:112-160) ------------------------
    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    def get_number_of_elements(self) -> jax.Array:
        return self.count

    def is_empty(self) -> jax.Array:
        return self.count == 0

    def get_element_at(self, i) -> jax.Array:
        return self.data[i]

    def set_element_at(self, i, v) -> "QueueFrontier":
        return QueueFrontier(self.data.at[i].set(v), self.count)

    def live_mask(self) -> jax.Array:
        return (jnp.arange(self.capacity) < self.count) & is_valid(self.data)

    # -- mutators (functional; vector_frontier.hxx:204-292) -------------
    def push_back(self, v) -> "QueueFrontier":
        return QueueFrontier(
            self.data.at[self.count].set(jnp.asarray(v, dtype=self.data.dtype)),
            self.count + 1,
        )

    def fill(self, v) -> "QueueFrontier":
        return QueueFrontier(jnp.full_like(self.data, v), self.count)

    def sequence(self, start: int, size: int) -> "QueueFrontier":
        """Fill with [start, start+size) (vector_frontier.hxx:236-254)."""
        idx = jnp.arange(self.capacity, dtype=self.data.dtype) + start
        data = jnp.where(
            jnp.arange(self.capacity) < size, idx, INVALID_VERTEX
        )
        return QueueFrontier(data, jnp.int32(size))

    def sort(self) -> "QueueFrontier":
        """Ascending sort of live elements (radix sort analog,
        vector_frontier.hxx:288-292); padding stays at the end."""
        big = jnp.iinfo(self.data.dtype).max
        keyed = jnp.where(self.live_mask(), self.data, big)
        s = jnp.sort(keyed)
        return QueueFrontier(jnp.where(s == big, INVALID_VERTEX, s), self.count)

    def to_mask(self, n_vertices: int) -> jax.Array:
        return queue_to_mask(self.data, self.count, n_vertices)

    def print(self, name: str = "frontier", k: int = 40) -> None:  # noqa: A003
        head = np.asarray(self.data[:k])
        print(f"{name} (count={int(self.count)}): {head}")
