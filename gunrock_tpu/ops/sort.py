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
