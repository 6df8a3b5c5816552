"""Probe: does the axon Mosaic toolchain support the manual-DMA pattern?

Tests the primitives the planned streaming semiring kernel needs:
HBM (ANY) operands, run_scoped VMEM/SMEM scratch + DMA semaphores,
make_async_copy HBM->SMEM and HBM->VMEM with dynamic slice indices read
from SMEM, fori_loop with scalar carries, and a VMEM->HBM flush.
"""

from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(cnt_ref, meta_hbm, x_hbm, y_hbm):
    B = 8  # meta batch

    def inner(meta_s, x_s, y_s, sem_meta, sem_x, sem_y):
        n = cnt_ref[0]

        def body(i, carry):
            # batch-refresh meta into SMEM
            @pl.when(i % B == 0)
            def _():
                dma = pltpu.make_async_copy(
                    meta_hbm.at[pl.ds(i, B)], meta_s, sem_meta
                )
                dma.start()
                dma.wait()

            blk = meta_s[i % B]  # dynamic scalar read from SMEM
            dma_x = pltpu.make_async_copy(x_hbm.at[blk], x_s, sem_x)
            dma_x.start()
            dma_x.wait()
            return carry + jnp.sum(x_s[...])

        total = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        y_s[...] = jnp.full_like(y_s, total)
        dma_y = pltpu.make_async_copy(y_s, y_hbm.at[0], sem_y)
        dma_y.start()
        dma_y.wait()

    pl.run_scoped(
        inner,
        meta_s=pltpu.SMEM((8,), jnp.int32),
        x_s=pltpu.VMEM((8, 128), jnp.float32),
        y_s=pltpu.VMEM((8, 128), jnp.float32),
        sem_meta=pltpu.SemaphoreType.DMA(()),
        sem_x=pltpu.SemaphoreType.DMA(()),
        sem_y=pltpu.SemaphoreType.DMA(()),
    )


def main(interpret: bool):
    n_blocks, n_chunks = 4, 16
    meta = jnp.asarray(np.random.default_rng(0).integers(0, n_blocks, n_chunks), jnp.int32)
    x = jnp.asarray(np.arange(n_blocks * 8 * 128).reshape(n_blocks, 8, 128), jnp.float32)
    cnt = jnp.asarray([n_chunks], jnp.int32)

    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        interpret=interpret,
    )(cnt, meta, x)
    expect = sum(float(x[int(b)].sum()) for b in np.asarray(meta))
    got = float(np.asarray(y)[0, 0, 0])
    print("expect", expect, "got", got, "MATCH" if abs(expect - got) < 1 else "MISMATCH")


if __name__ == "__main__":
    main(interpret="--interpret" in sys.argv)
