"""Probe 2: tpu.dynamic_gather shape limits + throughput on the chip.

jax 0.9 Mosaic lowers jnp.take_along_axis(x2d, idx2d, axis) with
x.shape == idx.shape == out.shape (lowering.py:2482-2524). Questions that
decide the semiring kernel redesign:

  wide      lane gather with 256 lanes  ([8, 256], idx in [0, 256))
            — does the permute cross the 128-lane vreg boundary?
  tall      sublane gather with 32 sublanes ([32, 128], idx in [0, 32))
  big       lane gather [1024, 128] (idx < 128) — bulk shape
  bench     throughput of [4096, 128] lane gather (0.5 Melem/call)
  bench_sub throughput of [4096, 128] sublane gather within 8-row groups?
            (idx in [0, 4096)? no — same-shape rule: idx in [0, 4096))

Usage: python benchmarks/probe_gather2.py all | <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = ("wide", "tall", "big", "bench", "bench_sub")


def run_variant(variant: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import numpy as np

    rng = np.random.default_rng(1)

    def lane_gather_call(shape, hi):
        x = rng.standard_normal(shape, dtype=np.float32)
        idx = rng.integers(0, hi, shape, dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32)
        )
        out = fn(x, idx)
        ref = np.take_along_axis(x, idx, axis=1)
        np.testing.assert_allclose(np.asarray(out), ref)
        return fn, jnp.asarray(x), jnp.asarray(idx)

    def sublane_gather_call(shape, hi):
        x = rng.standard_normal(shape, dtype=np.float32)
        idx = rng.integers(0, hi, shape, dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32)
        )
        out = fn(x, idx)
        ref = np.take_along_axis(x, idx, axis=0)
        np.testing.assert_allclose(np.asarray(out), ref)
        return fn, jnp.asarray(x), jnp.asarray(idx)

    if variant == "wide":
        lane_gather_call((8, 256), 256)
        print(json.dumps({"probe": "wide", "ok": True}))
    elif variant == "tall":
        sublane_gather_call((32, 128), 32)
        print(json.dumps({"probe": "tall", "ok": True}))
    elif variant == "big":
        lane_gather_call((1024, 128), 128)
        print(json.dumps({"probe": "big", "ok": True}))
    elif variant in ("bench", "bench_sub"):
        shape = (4096, 128)
        if variant == "bench":
            fn, jx, jidx = lane_gather_call(shape, 128)
        else:
            fn, jx, jidx = sublane_gather_call(shape, 4096)
        from gunrock_tpu.utils.timer import force_real_execution

        force_real_execution()
        out = fn(jx, jidx)
        jax.block_until_ready(out)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(jx, out.astype(jnp.int32) % jnp.int32(
                128 if variant == "bench" else 4096))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        out = out.astype(jnp.float32)
        gelems = shape[0] * shape[1] / dt / 1e9
        print(json.dumps({"probe": variant, "ok": True, "ms": dt * 1e3,
                          "gelems_per_s": round(gelems, 3)}))
    else:
        raise SystemExit(f"unknown {variant}")


def main():
    if sys.argv[1] == "all":
        for v in VARIANTS:
            r = subprocess.run(
                [sys.executable, __file__, v], capture_output=True,
                text=True, timeout=600,
            )
            ok = r.returncode == 0
            lines = [l for l in (r.stdout + r.stderr).strip().splitlines()
                     if not l.startswith("WARNING")]
            msg = "" if ok else (lines[-1][:300] if lines else "")
            res = lines[-1] if ok and lines else msg
            print(json.dumps({"probe": f"g2_{v}", "ok": ok, "res": res}),
                  flush=True)
        return
    run_variant(sys.argv[1])


if __name__ == "__main__":
    main()
