"""lax.sort throughput probe: the roadmap's TC question ("sort-join is
lax.sort-bound — measure sort throughput first").

Measures 1-key, 2-key, and 2-key+payload sorts at several sizes so the
TC/SpGEMM cost models have a real number. One size/arity per executable
is fine within one process (no Pallas involved). Prints one JSON line
per config.

Usage: python benchmarks/probe_sort.py [--sizes 1e6,1e7,1e8]
"""

from __future__ import annotations

import argparse
import json
import time

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1000000,10000000,100000000")
    p.add_argument("--num_runs", type=int, default=3)
    ns = p.parse_args()
    sizes = [int(float(s)) for s in ns.sizes.split(",")]

    from gunrock_tpu.utils.timer import force_real_execution

    force_real_execution()
    rng = np.random.default_rng(0)
    for n in sizes:
        keys = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        keys2 = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        payload = jnp.asarray(rng.random(n, dtype=np.float32))
        def lex_2pass(i, j, v):
            # lexicographic (i, j) via two STABLE 1-key passes (radix
            # trick): sort by j, then by i — candidate replacement for
            # the 2-key sort in the ESC contraction / TC join if 1-key
            # sorts are disproportionately faster on chip
            j1, i1, v1 = jax.lax.sort((j, i, v), num_keys=1, is_stable=True)
            i2, j2, v2 = jax.lax.sort((i1, j1, v1), num_keys=1, is_stable=True)
            return i2, j2, v2

        for arity, ops, fn in (
            ("1key", (keys,), None),
            ("2key", (keys, keys2), None),
            ("2key+f32", (keys, keys2, payload), None),
            ("lex-2pass+f32", (keys, keys2, payload), jax.jit(lex_2pass)),
        ):
            if fn is None:
                nk = min(2, len(ops))
                fn = jax.jit(lambda *a, nk=nk: jax.lax.sort(a, num_keys=nk))
            out = jax.block_until_ready(fn(*ops))
            t0 = time.perf_counter()
            for _ in range(ns.num_runs):
                out = fn(*ops)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) * 1e3 / ns.num_runs
            print(
                json.dumps(
                    {
                        "probe": "lax_sort",
                        "arity": arity,
                        "n": n,
                        "avg_ms": round(ms, 2),
                        "melem_per_s": round(n / ms / 1000.0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
