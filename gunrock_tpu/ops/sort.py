"""Device sort strategies (role of reference algorithms/sort/
radix_sort.hxx + stable_sort.hxx — thrust radix/stable wrappers; here
``lax.sort`` is the primitive and the strategy knob picks HOW a
lexicographic 2-key sort is lowered).

GUNROCK_LEX2PASS=1/0 selects the 2-pass stable-radix form globally:
sort by the minor key, then STABLE-sort by the major key — two 1-key
sorts can beat one 2-key sort when per-key comparator cost dominates.
Measured on chip (results_r2c.jsonl 2026-08-19): it depends on the
workload — SpGEMM ESC's (row, col, val) sort wins 1.34x (37.0 vs
49.5 s s16 end-to-end) while TC's packed join sort loses 1.7x (348 vs
205 ms) and isolated throughput loses (82-105 vs 201-230 Melem/s) —
so call sites pass their measured winner via ``two_pass`` and the env
var only overrides for A/B (separate processes, like all axon
benchmarking).
"""

from __future__ import annotations

import os

import jax


def lex_sort(operands: tuple, num_keys: int = 2, two_pass: bool | None = None):
    """Lexicographic sort of ``operands`` by its first ``num_keys``
    entries (the rest are payload). Same contract as ``jax.lax.sort``.
    ``two_pass``: None = GUNROCK_LEX2PASS env knob (default off);
    True/False = the call site's measured winner (env still overrides
    when set, so batteries can A/B without code edits)."""
    env = os.environ.get("GUNROCK_LEX2PASS")
    if env is not None:
        two_pass = env == "1"
    elif two_pass is None:
        two_pass = False
    if num_keys == 2 and two_pass:
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
