"""Device sort strategies (role of reference algorithms/sort/
radix_sort.hxx + stable_sort.hxx — thrust radix/stable wrappers; here
``lax.sort`` is the primitive and the strategy knob picks HOW a
lexicographic 2-key sort is lowered).

GUNROCK_LEX2PASS=1 selects the 2-pass stable-radix form: sort by the
minor key, then STABLE-sort by the major key — two 1-key sorts can beat
one 2-key sort when per-key comparator cost dominates (the open question
benchmarks/probe_sort.py measures on chip). Resolved at trace time; A/B
between settings = separate processes, like all axon benchmarking.
"""

from __future__ import annotations

import os

import jax


def lex_sort(operands: tuple, num_keys: int = 2):
    """Lexicographic sort of ``operands`` by its first ``num_keys``
    entries (the rest are payload). Same contract as ``jax.lax.sort``."""
    if num_keys == 2 and os.environ.get("GUNROCK_LEX2PASS") == "1":
        k0, k1, *rest = operands
        k1s, k0s, *rests = jax.lax.sort(
            (k1, k0, *rest), num_keys=1, is_stable=True
        )
        out = jax.lax.sort((k0s, k1s, *rests), num_keys=1, is_stable=True)
        return out
    return jax.lax.sort(operands, num_keys=num_keys)


def sort_keys(keys):
    """Ascending sort of a key array (reference radix_sort.hxx:39-47
    ``sort::radix::sort_keys`` — thrust::sort wrapper; here one
    ``lax.sort``, which XLA lowers to its on-device bitonic/radix path)."""
    return jax.lax.sort(keys)


def sort_pairs(keys, values):
    """Key-value pair sort ascending by key (reference
    radix_sort.hxx:49-62 ``sort::radix::sort_pairs``)."""
    return jax.lax.sort((keys, values), num_keys=1, is_stable=True)


def stable_sort_by(*operands, num_keys: int = 1):
    """Stable lexicographic sort of ``operands`` by the first
    ``num_keys`` entries (reference sort/stable_sort.hxx —
    thrust::stable_sort_by_key). Routes through :func:`lex_sort` so the
    GUNROCK_LEX2PASS strategy knob applies to 2-key calls."""
    if num_keys == 2:
        return lex_sort(tuple(operands), num_keys=2)
    return jax.lax.sort(tuple(operands), num_keys=num_keys, is_stable=True)
