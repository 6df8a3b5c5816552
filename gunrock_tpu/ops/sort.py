"""Sort support algorithms.

Role of reference algorithms/sort/ (radix_sort.hxx:39-62 thrust radix
sort, stable_sort.hxx): device sorts used by uniquify and SpGEMM. XLA's
``lax.sort`` is the TPU radix/bitonic equivalent; multi-operand sorts
give key-value and lexicographic behavior without 64-bit key packing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_keys(keys):
    """Ascending key sort (reference sort::radix::sort_keys)."""
    return jnp.sort(keys)


def sort_pairs(keys, values):
    """Key-value sort (reference sort::radix::sort_pairs)."""
    return jax.lax.sort((keys, values), num_keys=1)


def stable_sort_by(*keys_then_values, num_keys: int = 1):
    """Lexicographic multi-key sort (reference sort::stable in spgemm)."""
    return jax.lax.sort(keys_then_values, num_keys=num_keys)
