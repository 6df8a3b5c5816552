"""batch: run a per-source job over many sources at once.

Role of reference include/gunrock/framework/operators/batch/batch.hxx:61-84
— a ``std::thread`` fan-out sharing one GPU (used by BC-from-every-source,
algorithms/bc.hxx:304-321, and multi-seed PPR, ppr.hxx:217-238).

TPU redesign: ``jax.vmap`` over the source axis — the batched algorithm
compiles into one XLA program with the source dimension vectorized, a
strictly stronger form of the reference's host-thread trick. For memory
control, sources are processed in chunks via ``lax.map`` over vmapped
blocks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def batch(fn: Callable, sources, chunk_size: int | None = None):
    """Apply ``fn(source) -> pytree`` over a 1-D array of sources.

    Returns a pytree with a leading source axis. ``chunk_size`` bounds
    peak memory: chunks run sequentially (lax.map), sources within a chunk
    vectorize (vmap).
    """
    sources = jnp.asarray(sources)
    n = sources.shape[0]
    if chunk_size is None or chunk_size >= n:
        return jax.vmap(fn)(sources)

    # Pad to a whole number of chunks, then lax.map over vmapped chunks.
    n_chunks = -(-n // chunk_size)
    padded = jnp.concatenate(
        [sources, jnp.broadcast_to(sources[-1:], (n_chunks * chunk_size - n,))]
    )
    chunks = padded.reshape(n_chunks, chunk_size)
    out = jax.lax.map(jax.vmap(fn), chunks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks * chunk_size,) + x.shape[2:])[:n], out
    )
