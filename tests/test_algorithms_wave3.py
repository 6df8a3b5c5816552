"""Geo / SpGEMM vs oracles."""

import numpy as np

from tests.conftest import random_graph


# ---------------------------------------------------------------- Geo
def test_geo_one_and_two_neighbors():
    """Vertices with 1 labeled neighbor copy it; with 2, take the
    spherical midpoint (reference geo.hxx:345-366)."""
    from gunrock_tpu.algorithms import geo
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    # v2 -> v0 (labeled); v3 -> v0, v1 (labeled)
    rows = np.array([2, 3, 3], np.int32)
    cols = np.array([0, 0, 1], np.int32)
    vals = np.ones(3, np.float32)
    g = build_graph(
        coo_to_csr(Coo(4, 4, rows, cols, vals)),
        GraphProperties(directed=True, weighted=False),
    )
    lat = np.array([10.0, 20.0, np.nan, np.nan], np.float32)
    lon = np.array([30.0, 40.0, np.nan, np.nan], np.float32)
    res = geo.run(g, lat, lon, total_iterations=2, spatial_iterations=5, warmup=False)
    out_lat, out_lon = np.asarray(res.latitude), np.asarray(res.longitude)
    assert abs(out_lat[2] - 10.0) < 1e-4 and abs(out_lon[2] - 30.0) < 1e-4
    # midpoint of (10,30) and (20,40) on the sphere
    want_lat, want_lon = _midpoint_oracle(10, 30, 20, 40)
    assert abs(out_lat[3] - want_lat) < 1e-3
    assert abs(out_lon[3] - want_lon) < 1e-3


def _midpoint_oracle(lat1, lon1, lat2, lon2):
    import math

    lat1, lon1, lat2, lon2 = map(math.radians, (lat1, lon1, lat2, lon2))
    bx = math.cos(lat2) * math.cos(lon2 - lon1)
    by = math.cos(lat2) * math.sin(lon2 - lon1)
    mlat = math.atan2(
        math.sin(lat1) + math.sin(lat2),
        math.sqrt((math.cos(lat1) + bx) ** 2 + by**2),
    )
    mlon = lon1 + math.atan2(by, math.cos(lat1) + bx)
    return math.degrees(mlat), math.degrees(mlon)


def test_geo_spatial_median_converges_to_cluster():
    """A vertex whose labeled neighbors cluster around one point must land
    near that cluster (spatial median robustness)."""
    from gunrock_tpu.algorithms import geo
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    # v0 has 5 labeled neighbors: 4 clustered at ~ (50, 8), 1 outlier
    n = 6
    rows = np.zeros(5, np.int32)
    cols = np.arange(1, 6).astype(np.int32)
    g = build_graph(
        coo_to_csr(Coo(n, n, rows, cols, np.ones(5, np.float32))),
        GraphProperties(directed=True),
    )
    lat = np.array([np.nan, 50.0, 50.1, 49.9, 50.05, -30.0], np.float32)
    lon = np.array([np.nan, 8.0, 8.1, 7.9, 8.05, 120.0], np.float32)
    res = geo.run(g, lat, lon, total_iterations=1, spatial_iterations=200, warmup=False)
    assert abs(float(res.latitude[0]) - 50.0) < 0.5
    assert abs(float(res.longitude[0]) - 8.0) < 0.5


def test_geo_propagates_over_iterations():
    """Labels spread hop by hop across outer iterations."""
    from gunrock_tpu.algorithms import geo
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    # chain 3 -> 2 -> 1 -> 0 (labeled)
    rows = np.array([1, 2, 3], np.int32)
    cols = np.array([0, 1, 2], np.int32)
    g = build_graph(
        coo_to_csr(Coo(4, 4, rows, cols, np.ones(3, np.float32))),
        GraphProperties(directed=True),
    )
    lat = np.array([42.0, np.nan, np.nan, np.nan], np.float32)
    lon = np.array([7.0, np.nan, np.nan, np.nan], np.float32)
    res = geo.run(g, lat, lon, total_iterations=3, spatial_iterations=5, warmup=False)
    np.testing.assert_allclose(np.asarray(res.latitude), [42, 42, 42, 42], atol=1e-3)


# ---------------------------------------------------------------- SpGEMM
def test_spgemm_matches_scipy():
    from gunrock_tpu.algorithms import spgemm

    ga, A = random_graph(None, n=40, p=0.1, weighted=True, seed_offset=31)
    gb, B = random_graph(None, n=40, p=0.12, weighted=True, seed_offset=32)
    res = spgemm.run(ga, gb, warmup=False)
    C = res.to_csr(40, 40)
    want = (A @ B).toarray()
    got = np.zeros((40, 40), np.float32)
    for r in range(40):
        for e in range(C.row_offsets[r], C.row_offsets[r + 1]):
            got[r, C.col_indices[e]] = C.values[e]
    # cumsum-difference contraction accumulates in prefix order: tolerate
    # a few ulps vs scipy's per-row accumulation
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    assert res.nnz == (want != 0).sum()


def test_spgemm_squared_sample():
    from gunrock_tpu.algorithms import spgemm
    from gunrock_tpu.io import sample

    g = sample.graph()
    res = spgemm.run(g, g, warmup=False)
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (
            np.asarray(g.values),
            np.asarray(g.col_indices),
            np.asarray(g.row_offsets),
        ),
        shape=(4, 4),
    )
    want = (A @ A).toarray()
    C = res.to_csr(4, 4).to_dense() if hasattr(res.to_csr(4, 4), "to_dense") else None
    got = np.zeros((4, 4), np.float32)
    Cc = res.to_csr(4, 4)
    for r in range(4):
        for e in range(Cc.row_offsets[r], Cc.row_offsets[r + 1]):
            got[r, Cc.col_indices[e]] = Cc.values[e]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_spgemm_streaming_matches_single_shot():
    """Row-blocked streaming (tiny budget forces many blocks) must equal
    the single-shot ESC result and scipy."""
    import scipy.sparse as sp

    from gunrock_tpu.algorithms import spgemm

    ga, Aa = random_graph(None, n=120, p=0.08, weighted=True, seed_offset=70)
    gb, Ab = random_graph(None, n=120, p=0.08, weighted=True, seed_offset=71)
    want = (Aa @ Ab).tocoo()
    res = spgemm.run(ga, gb, warmup=False, block_products=500)
    got = sp.coo_matrix(
        (np.asarray(res.values)[: res.nnz],
         (np.asarray(res.row_indices)[: res.nnz],
          np.asarray(res.col_indices)[: res.nnz])),
        shape=(120, 120),
    ).tocsr()
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-4, atol=1e-5)

    cnt = spgemm.run(ga, gb, warmup=False, block_products=500, count_only=True)
    assert cnt.nnz == want.nnz
    np.testing.assert_allclose(
        float(cnt.values[0]), float(want.data.sum()), rtol=1e-3
    )


def test_spgemm_streaming_oversized_row():
    """A hub row whose expansion alone exceeds the budget gets its own
    oversized block and still contracts exactly."""
    import scipy.sparse as sp

    from gunrock_tpu.algorithms import spgemm
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    n = 64
    rng = np.random.default_rng(7)
    # row 0 connects to everything (hub); plus random sparse rest
    rows = np.concatenate([np.zeros(n, np.int32), rng.integers(1, n, 60).astype(np.int32)])
    cols = np.concatenate([np.arange(n, dtype=np.int32), rng.integers(0, n, 60).astype(np.int32)])
    vals = rng.random(rows.size).astype(np.float32)
    coo = Coo(n_rows=n, n_cols=n, row_indices=rows, col_indices=cols, values=vals)
    g = build_graph(coo_to_csr(coo), GraphProperties(directed=True, weighted=True, symmetric=False))
    A = sp.csr_matrix((np.asarray(g.values), np.asarray(g.col_indices), np.asarray(g.row_offsets)), shape=(n, n))
    want = (A @ A).tocoo()
    res = spgemm.run(g, g, warmup=False, block_products=100)
    got = sp.coo_matrix(
        (np.asarray(res.values)[: res.nnz],
         (np.asarray(res.row_indices)[: res.nnz],
          np.asarray(res.col_indices)[: res.nnz])),
        shape=(n, n),
    ).tocsr()
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-4, atol=1e-5)


def test_spgemm_dense_strategy_matches_scipy():
    """strategy="dense" (row-blocked SpMM, no sort/gathers) must match
    scipy exactly on nnz and closely on values (two-pass bf16 split), in
    both materializing and count_only modes; V=200 > block_rows=128
    exercises the multi-block loop."""
    import scipy.sparse as sp

    from gunrock_tpu.algorithms import spgemm

    ga, Aa = random_graph(None, n=200, p=0.05, weighted=True, seed_offset=80)
    gb, Ab = random_graph(None, n=200, p=0.06, weighted=True, seed_offset=81)
    want = (Aa @ Ab).tocsr()
    want.sum_duplicates()

    res = spgemm.run(ga, gb, warmup=False, strategy="dense")
    assert res.nnz == want.nnz
    got = sp.coo_matrix(
        (np.asarray(res.values)[: res.nnz],
         (np.asarray(res.row_indices)[: res.nnz],
          np.asarray(res.col_indices)[: res.nnz])),
        shape=(200, 200),
    ).tocsr()
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-3, atol=1e-4)

    cnt = spgemm.run(ga, gb, warmup=False, strategy="dense", count_only=True)
    assert cnt.nnz == want.nnz
    np.testing.assert_allclose(
        float(cnt.values[0]), float(want.data.sum()), rtol=1e-3
    )


def test_spgemm_piecewise_expand_matches_gathers():
    """_piecewise_expand (scatter+cumsum telescopes) must reproduce the
    gather formulation i = rows[a_id], b_e = b_start[a_id] + t - off[a_id]
    on irregular segments including empty ones."""
    import jax.numpy as jnp

    from gunrock_tpu.algorithms.spgemm import _piecewise_expand

    rng = np.random.default_rng(5)
    counts = rng.integers(0, 6, 40)
    counts[[3, 7, 8, 20]] = 0  # runs of empty segments
    off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    total = int(off[-1])
    rows = np.sort(rng.integers(0, 30, 40)).astype(np.int32)
    b_start = rng.integers(0, 1000, 40).astype(np.int32)

    # oracle by direct per-product evaluation
    a_id = np.searchsorted(off, np.arange(total), side="right") - 1
    want_i = rows[a_id]
    want_b = b_start[a_id] + np.arange(total) - off[a_id]

    i, b_e = _piecewise_expand(
        jnp.asarray(rows), jnp.asarray(b_start), jnp.asarray(off[:-1]), total
    )
    np.testing.assert_array_equal(np.asarray(i), want_i)
    np.testing.assert_array_equal(np.asarray(b_e), want_b)


def test_spgemm_auto_strategy():
    """strategy="auto" picks by the products-vs-dense-work crossover and
    produces the same counts either way."""
    import os

    from gunrock_tpu.algorithms import spgemm
    from tests.conftest import random_graph

    g, A = random_graph(None, n=200, p=0.05, weighted=True, seed_offset=61)
    want = (A @ A).nnz
    auto = spgemm.run(g, g, warmup=False, strategy="auto", count_only=True)
    assert auto.nnz == want
    # force each branch through the knob
    os.environ["GUNROCK_SPGEMM_AUTO_K"] = "1e-9"  # everything -> dense
    try:
        d = spgemm.run(g, g, warmup=False, strategy="auto", count_only=True)
        assert d.nnz == want
        os.environ["GUNROCK_SPGEMM_AUTO_K"] = "1e9"  # everything -> esc
        e = spgemm.run(g, g, warmup=False, strategy="auto", count_only=True)
        assert e.nnz == want
    finally:
        del os.environ["GUNROCK_SPGEMM_AUTO_K"]


def test_geo_pallas_wstep_matches_xla():
    """The Pallas Weiszfeld-step kernel (ops/pallas/geo_step.py — slot-
    space coordinates, dynamic-gather iterate reads, 4-channel shared
    MXU scatter, polynomial arcsin) must track the XLA path within the
    asin approximation error (~1e-6 rel on distances)."""
    import numpy as np

    from gunrock_tpu.algorithms import geo
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g = rmat_graph(scale=9, edge_factor=12, seed=5, undirected=True)
    rng = np.random.default_rng(0)
    lat = np.where(rng.random(g.n_vertices) < 0.4,
                   rng.uniform(-60, 60, g.n_vertices), np.nan)
    lon = np.where(np.isnan(lat), np.nan,
                   rng.uniform(-170, 170, g.n_vertices))
    lat = lat.astype(np.float32)
    lon = lon.astype(np.float32)
    kw = dict(total_iterations=2, spatial_iterations=25, warmup=False)
    r_x = geo.run(g, lat, lon,
                  options=Options(load_balance=LoadBalance.XLA_SEGMENT),
                  **kw)
    r_p = geo.run(
        g, lat, lon,
        options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH), **kw
    )
    for a, b in ((r_x.latitude, r_p.latitude),
                 (r_x.longitude, r_p.longitude)):
        a, b = np.asarray(a), np.asarray(b)
        m = np.isfinite(a)
        np.testing.assert_array_equal(m, np.isfinite(b))
        np.testing.assert_allclose(a[m], b[m], rtol=2e-3, atol=2e-3)


def test_geo_step_asin_poly_accuracy():
    import jax.numpy as jnp
    import numpy as np

    from gunrock_tpu.ops.pallas.geo_step import _asin_poly

    x = np.linspace(0.0, 1.0, 4001, dtype=np.float32)
    got = np.asarray(_asin_poly(jnp.asarray(x)))
    want = np.arcsin(x.astype(np.float64))
    assert float(np.max(np.abs(got - want))) < 2e-6
