"""Probe: does axon Mosaic (jax 0.9) lower a REAL dynamic gather on TPU?

The semiring kernels pay ~frag*W compare-ops/edge for one-hot gathers and
scatters ([C, W] iota compares) because vector dynamic indexing of refs is
unsupported. If any of these value-level gathers compiles AND runs fast,
the one-hot wall (VERDICT round-3 weak #2: kernels at 0.4-2% of stream)
falls.

Variants (one subprocess each — distinct Pallas executables in one
process can fault the device, see CLAUDE.md):
  lane      out[i, j] = x[i, idx[i, j]]           take_along_axis axis=-1
  sublane   out[i, j] = x[idx[i, j], j]           take_along_axis axis=-2
  flat      out[j]    = x_flat[idx_flat[j]]       1-D jnp.take
  twolevel  rows = onehot(hi) @ x2d (MXU), then lane-gather lo
  bench     time `lane` at semiring-like shapes [256, 128] from [8, 128]

Usage: python benchmarks/probe_gather.py <variant> [--interpret]
       python benchmarks/probe_gather.py all        # subprocess driver
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = ("lane", "sublane", "flat", "twolevel", "bench")


def _build(variant: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import numpy as np

    rng = np.random.default_rng(0)

    if variant == "lane":
        x = rng.standard_normal((8, 128), dtype=np.float32)
        idx = rng.integers(0, 128, (8, 128), dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(x, idx)
        ref = np.take_along_axis(x, idx, axis=1)
        return np.asarray(out), ref

    if variant == "sublane":
        x = rng.standard_normal((8, 128), dtype=np.float32)
        idx = rng.integers(0, 8, (8, 128), dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(x, idx)
        ref = np.take_along_axis(x, idx, axis=0)
        return np.asarray(out), ref

    if variant == "flat":
        x = rng.standard_normal((2048,), dtype=np.float32)
        idx = rng.integers(0, 2048, (256,), dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take(x_ref[...], i_ref[...])

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((256,), jnp.float32),
            interpret=interpret,
        )(x, idx)
        ref = x[idx]
        return np.asarray(out), ref

    if variant == "twolevel":
        # gather C=256 values from a W=2048 window: hi one-hot on the MXU
        # ([C, S] bf16 — S=16 compares/edge, not W), lo via lane gather.
        W, C, S = 2048, 256, 16
        x = rng.standard_normal((W,), dtype=np.float32)
        idx = rng.integers(0, W, (C,), dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            xs = x_ref[...].reshape(S, 128)
            ii = i_ref[...].reshape(2, 128)  # C as [2, 128] tile
            hi = ii // 128
            lo = ii - hi * 128
            hi_f = hi.reshape(C, 1)
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
            oh = (hi_f == hi_iota).astype(jnp.float32)
            rows = jnp.dot(oh, xs, preferred_element_type=jnp.float32)
            rows2 = rows.reshape(2, 128, 128)
            got = jnp.take_along_axis(
                rows2, lo[:, :, None], axis=2
            )[..., 0]
            o_ref[...] = got

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            interpret=interpret,
        )(x, idx)
        ref = x[idx].reshape(2, 128)
        return np.asarray(out), ref

    if variant == "bench":
        # throughput: R independent [8,128]-window lane gathers per call
        R = 512
        x = rng.standard_normal((R, 8, 128), dtype=np.float32)
        idx = rng.integers(0, 128, (R, 8, 128), dtype=np.int32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(
                x_ref[...], i_ref[...], axis=2
            )

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 8, 128), jnp.float32),
            interpret=interpret,
        )
        jx, jidx = jnp.asarray(x), jnp.asarray(idx)
        out = fn(jx, jidx)
        ref = np.take_along_axis(x, idx, axis=2)
        np.testing.assert_allclose(np.asarray(out), ref)
        from gunrock_tpu.utils.timer import force_real_execution

        force_real_execution()
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(jx, jidx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        gelems = R * 8 * 128 / dt / 1e9
        print(json.dumps({"probe": "gather_bench", "ms": dt * 1e3,
                          "gelems_per_s": round(gelems, 3)}))
        return np.asarray(out), ref

    raise SystemExit(f"unknown variant {variant}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "all":
        for v in VARIANTS:
            r = subprocess.run(
                [sys.executable, __file__, v], capture_output=True,
                text=True, timeout=600,
            )
            ok = r.returncode == 0
            tail = (r.stdout + r.stderr).strip().splitlines()
            msg = tail[-1][:300] if tail else ""
            print(json.dumps({"probe": f"gather_{v}", "ok": ok,
                              "msg": msg}), flush=True)
        return
    variant = sys.argv[1]
    interpret = "--interpret" in sys.argv
    import numpy as np

    out, ref = _build(variant, interpret)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    print(f"{variant}: OK")


if __name__ == "__main__":
    main()
