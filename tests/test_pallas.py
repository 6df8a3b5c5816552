"""Pallas kernels in interpreter mode vs oracles (compiled path exercised
on the real chip by bench/verify)."""

import numpy as np

from tests.conftest import random_graph


def test_bucketed_layout_roundtrip():
    from gunrock_tpu.ops.pallas.layout import layout_for_graph

    g, A = random_graph(None, n=200, p=0.08, weighted=True, seed_offset=60)
    layout = layout_for_graph(g, window=64, chunk=128)
    # every edge appears exactly once: total padded value sum == edge sum
    assert np.isclose(
        float(np.asarray(layout.values).sum()), float(A.sum()), rtol=1e-5
    )
    # chunks ordered by row block so output windows revisit consecutively
    rb = np.asarray(layout.chunk_rb)
    assert (np.diff(rb) >= 0).all()
    # local ids stay inside the window
    assert int(np.asarray(layout.row_local).max()) < layout.window
    assert int(np.asarray(layout.col_local).max()) < layout.window


def test_pallas_spmv_interpret_matches_scipy():
    from gunrock_tpu.ops.pallas import spmv as pspmv

    g, A = random_graph(None, n=300, p=0.05, weighted=True, seed_offset=61)
    x = np.random.default_rng(1).random(300).astype(np.float32)
    y = pspmv.spmv(g, x, window=128, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-4, atol=1e-5)


def test_pallas_spmv_empty_rows_and_isolated():
    from gunrock_tpu.ops.pallas import spmv as pspmv

    g, A = random_graph(None, n=150, p=0.01, weighted=True, seed_offset=62)
    x = np.random.default_rng(2).random(150).astype(np.float32)
    y = pspmv.spmv(g, x, window=128, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-4, atol=1e-5)


def test_pallas_spmm_interpret_matches_scipy():
    from gunrock_tpu.algorithms.spmv import spmm_kernel
    from gunrock_tpu.ops.pallas.layout import layout_for_graph

    g, A = random_graph(None, n=300, p=0.05, weighted=True, seed_offset=63)
    X = np.random.default_rng(2).random((300, 8)).astype(np.float32)
    layout = layout_for_graph(g, window=128, chunk=256)
    Y = np.asarray(spmm_kernel(g, X, layout=layout, interpret=True))
    # two-pass bf16 split: ~f32 accurate
    np.testing.assert_allclose(Y, A @ X, rtol=2e-3, atol=2e-4)


def test_pallas_semiring_min_plus_interpret():
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.semiring import _BIG, bucketed_semiring_spmv, pull_layout

    g, A = random_graph(None, n=200, p=0.06, weighted=True, seed_offset=64)
    layout = pull_layout(g, window=128, chunk=256, pad_value=_BIG)
    x = np.random.default_rng(3).random(200).astype(np.float32)
    y = np.asarray(
        bucketed_semiring_spmv(layout, jnp.asarray(x), "min_plus", interpret=True)
    )
    # oracle: y[v] = min over in-edges (u,v) of w + x[u]
    D = A.toarray()
    want = np.full(200, np.inf, np.float32)
    for v in range(200):
        us = np.nonzero(D[:, v])[0]
        if us.size:
            want[v] = (D[us, v] + x[us]).min()
    np.testing.assert_allclose(y, want, rtol=1e-5)


def test_spmv_run_pallas_option():
    """spmv.run with the Pallas strategy (interpret on CPU) matches XLA."""
    from gunrock_tpu.algorithms import spmv
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g, A = random_graph(None, n=200, p=0.05, weighted=True, seed_offset=65)
    x = np.random.default_rng(5).random(200).astype(np.float32)
    r = spmv.run(
        g, x, options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
        warmup=False,
    )
    np.testing.assert_allclose(np.asarray(r.y), A @ x, rtol=1e-3, atol=1e-4)
