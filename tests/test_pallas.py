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
    # real-edge local ids stay inside the window; padding slots carry the
    # row sentinel == window (round 5: scatter-dropped without a value
    # identity, enabling the value-less unit kernels)
    rl = np.asarray(layout.row_local)
    assert int(rl.max()) <= layout.window
    assert int(rl[rl < layout.window].max(initial=0)) < layout.window
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


def test_semiring_unoccupied_row_windows():
    """Row windows no chunk maps to (e.g. trailing isolated vertices) must
    return the semiring identity, not uninitialized memory."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import _BIG, bucketed_semiring_spmv

    # 300 vertices, all edges inside [0, 64): row windows 1..2 are empty
    V, W = 300, 128
    rows = np.array([1, 2, 3, 10], np.int64)
    cols = np.array([0, 1, 0, 5], np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    x = np.arange(V, dtype=np.float32) + 1.0

    lay = build_bucketed_layout(rows, cols, vals, V, window=W, chunk=128)
    y = np.asarray(bucketed_semiring_spmv(lay, jnp.asarray(x), "plus_times", interpret=True))
    assert (y[128:] == 0.0).all(), "unoccupied plus_times windows must be 0"

    lay_mp = build_bucketed_layout(rows, cols, vals, V, window=W, chunk=128,
                                   pad_value=_BIG)
    y = np.asarray(bucketed_semiring_spmv(lay_mp, jnp.asarray(x), "min_plus", interpret=True))
    assert np.isinf(y[128:]).all(), "unoccupied min_plus windows must be +inf"


def test_spmm_unoccupied_row_windows():
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    V, W = 300, 128
    rows = np.array([1, 2], np.int64)
    cols = np.array([0, 1], np.int64)
    vals = np.array([1.0, 2.0], np.float32)
    lay = build_bucketed_layout(rows, cols, vals, V, window=W, chunk=128)
    X = np.ones((V, 8), np.float32)
    Y = np.asarray(bucketed_spmm(lay, jnp.asarray(X), interpret=True))
    assert (Y[128:] == 0.0).all()


def test_spmv_sparse_tail_grids_match_dense():
    """Every frontier-sparse kernel now dispatches over tail grids
    (n_chunks, /8, /64); a collapsed one-window frontier must select the
    smallest grid and still match the dense kernel on masked input, for
    all three semirings."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import (
        _BIG, bucketed_semiring_spmv, bucketed_semiring_spmv_sparse,
    )

    rng = np.random.default_rng(11)
    V, W, E = 1000, 128, 6000
    rows = rng.integers(0, V, E)
    cols = rng.integers(0, V, E)
    vals = (rng.random(E) + 0.5).astype(np.float32)
    x = (rng.random(V) + 0.5).astype(np.float32)
    active = np.zeros(V, bool)
    active[:100] = True  # one source window -> smallest grid branch
    for sr, pad in (("plus_times", 0.0), ("min_plus", _BIG),
                    ("max_times", 0.0)):
        # inactive x slots must carry the GATHER identity (the documented
        # contract): 0 for plus/max_times, +BIG for min_plus (as SSSP's
        # unreached distances do)
        xa = jnp.asarray(
            np.where(active, x, _BIG if sr == "min_plus" else 0.0).astype(
                np.float32
            )
        )
        lay = build_bucketed_layout(rows, cols, vals, V, window=W,
                                    chunk=128, pad_value=pad)
        want = np.asarray(
            bucketed_semiring_spmv(lay, xa, sr, interpret=True)
        )
        got = np.asarray(
            bucketed_semiring_spmv_sparse(
                lay, xa, jnp.asarray(active), sr, interpret=True
            )
        )
        if sr == "min_plus":
            # rows with no active in-edge: sparse returns inf (identity)
            mask = np.isfinite(got)
            np.testing.assert_allclose(got[mask], want[mask], rtol=1e-6)
        else:
            touched = got != 0
            np.testing.assert_allclose(
                got[touched], want[touched], rtol=1e-5
            )


def test_spmm_sparse_matches_dense():
    """bucketed_spmm_sparse == A @ X restricted to active sources, in
    both exact-bf16 and hi+lo modes, with out_mask row skipping and the
    tail-grid lax.cond dispatch exercised (active set collapsed to one
    window so the smallest compiled grid runs)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm_sparse

    rng = np.random.default_rng(7)
    V, W, K, E = 500, 128, 16, 3000
    rows = rng.integers(0, V, E)
    cols = rng.integers(0, V, E)
    vals = rng.integers(0, 2, E).astype(np.float32)  # {0,1} edge values
    lay = build_bucketed_layout(rows, cols, vals, V, window=W, chunk=128)
    A = np.zeros((V, V), np.float32)
    np.add.at(A, (rows, cols), vals)

    # signed small-int X (the delta-one-hot use case) — exact mode
    X = rng.integers(-1, 2, (V, K)).astype(np.float32)
    for active_frac, exact in [(1.0, True), (1.0, False), (0.05, True)]:
        active = np.zeros(V, bool)
        n_act = max(1, int(V * active_frac))
        active[:n_act] = True  # one window when frac is small
        Xa = X * active[:, None]
        want = A @ Xa
        got = np.asarray(
            bucketed_spmm_sparse(
                lay, jnp.asarray(Xa), jnp.asarray(active),
                interpret=True, exact=exact,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4), (active_frac, exact)

    # out_mask: unmasked-window rows return 0, masked rows exact
    out_mask = np.zeros(V, bool)
    out_mask[:W] = True
    active = np.ones(V, bool)
    got = np.asarray(
        bucketed_spmm_sparse(
            lay, jnp.asarray(X), jnp.asarray(active),
            interpret=True, out_mask=jnp.asarray(out_mask), exact=True,
        )
    )
    np.testing.assert_allclose(got[:W], (A @ X)[:W], atol=1e-4)


def test_color_pallas_isolated_and_priority_zero():
    """A priority-0 vertex with no uncolored neighbors (e.g. isolated)
    must still get colored (regression: the loop used to spin to max_it
    and return INVALID_COLOR)."""
    import scipy.sparse as sp

    from gunrock_tpu.algorithms import color
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    # 8-vertex graph: a path 0-1-2-3 (symmetric), vertices 4..7 isolated
    rows = np.array([0, 1, 1, 2, 2, 3], np.int32)
    cols = np.array([1, 0, 2, 1, 3, 2], np.int32)
    g = build_graph(
        coo_to_csr(Coo(n_rows=8, n_cols=8, row_indices=rows, col_indices=cols,
                       values=np.ones(6, np.float32))),
        GraphProperties(directed=False, weighted=False, symmetric=True),
    )
    for seed in range(4):
        for ordering in ("random", "degree"):
            colors, it = color.color_kernel_pallas(
                g, seed=seed, interpret=True, ordering=ordering,
                max_iterations=32,
            )
            colors = np.asarray(colors)
            assert (colors >= 0).all(), (seed, ordering, colors)
            # proper coloring on the path edges
            assert (colors[rows] != colors[cols]).all(), (seed, ordering)


def test_cached_layout_weakref_eviction():
    """Layout cache entries die with their anchor array and a recycled
    id() cannot serve a stale layout."""
    import gc

    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas import layout as L

    a = jnp.arange(64, dtype=jnp.int32)
    built = []

    def build():
        built.append(1)
        return "layout-A"

    assert L.cached_layout(a, build, ("k",)) == "layout-A"
    assert L.cached_layout(a, build, ("k",)) == "layout-A"
    assert len(built) == 1
    key = id(a)
    assert key in L._GRAPH_LAYOUT_CACHE
    del a
    gc.collect()
    assert key not in L._GRAPH_LAYOUT_CACHE, "entry must die with its array"


def test_sparse_semiring_matches_dense():
    """Frontier-sparse chunk-skipping kernel == dense kernel for every
    semiring and several frontier densities (interpret mode)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import (
        _BIG,
        bucketed_semiring_spmv,
        bucketed_semiring_spmv_sparse,
    )

    g, A = random_graph(None, n=300, p=0.04, weighted=True, seed_offset=91)
    rng = np.random.default_rng(9)
    for semiring, pad in [("plus_times", 0.0), ("min_plus", _BIG),
                          ("max_times", 0.0)]:
        lay = build_bucketed_layout(
            np.asarray(g.col_indices), np.asarray(g.edge_src),
            np.asarray(g.values), g.n_vertices, window=128, chunk=128,
            pad_value=pad,
        )
        for density in (0.0, 0.02, 0.3, 1.0):
            active = jnp.asarray(rng.random(300) < density)
            ident = _BIG if semiring == "min_plus" else 0.0
            xv = rng.random(300).astype(np.float32) + 0.1
            x = jnp.where(active, jnp.asarray(xv), ident)
            want = bucketed_semiring_spmv(lay, x, semiring, interpret=True)
            got = bucketed_semiring_spmv_sparse(
                lay, x, active, semiring, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6,
                err_msg=f"{semiring} d={density}",
            )


def test_sparse_semiring_out_mask():
    """out_mask skips destination windows: masked rows must be exact,
    unmasked rows may return the identity (interpret mode)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv,
        bucketed_semiring_spmv_sparse,
    )

    g, A = random_graph(None, n=300, p=0.04, weighted=True, seed_offset=17)
    rng = np.random.default_rng(4)
    lay = build_bucketed_layout(
        np.asarray(g.col_indices), np.asarray(g.edge_src),
        np.asarray(g.values), g.n_vertices, window=128, chunk=128,
    )
    active = jnp.asarray(rng.random(300) < 0.4)
    out_mask = jnp.asarray(rng.random(300) < 0.3)
    x = jnp.where(active, jnp.asarray(rng.random(300, dtype=np.float32)), 0.0)
    want = bucketed_semiring_spmv(lay, x, "max_times", interpret=True)
    got = bucketed_semiring_spmv_sparse(
        lay, x, active, "max_times", interpret=True, out_mask=out_mask
    )
    om = np.asarray(out_mask)
    np.testing.assert_allclose(
        np.asarray(got)[om], np.asarray(want)[om], rtol=1e-5
    )


def test_bfs_do_pallas_pull_matches():
    """Direction-optimized BFS with the doubly-masked Pallas pull must
    match the XLA path exactly (interpret mode)."""
    from gunrock_tpu.algorithms.bfs import bfs_kernel_do
    from gunrock_tpu.ops.pallas.semiring import pull_layout

    g, A = random_graph(None, n=200, p=0.05, weighted=False, seed_offset=33)
    lay = pull_layout(g, window=128, chunk=128, unit=True)
    d_xla, it1 = bfs_kernel_do(g, 0, edge_budget=64)
    d_pal, it2 = bfs_kernel_do(g, 0, edge_budget=64, layout=lay,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_xla))
    assert int(it1) == int(it2)


def test_bfs_do_mixed_layout_matches():
    """Mixed-layout DO (peak levels on a bigger-window layout) must be
    bit-identical to the single-layout Pallas path and the XLA path."""
    from gunrock_tpu.algorithms.bfs import bfs_kernel_do
    from gunrock_tpu.ops.pallas.semiring import pull_layout

    g, A = random_graph(None, n=300, p=0.04, weighted=False, seed_offset=77)
    lay = pull_layout(g, window=128, chunk=128, unit=True)
    lay_big = pull_layout(g, window=256, chunk=256, unit=True)
    d_xla, it1 = bfs_kernel_do(g, 0, edge_budget=64)
    d_mix, it2 = bfs_kernel_do(g, 0, edge_budget=64, layout=lay,
                               layout_dense=lay_big, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_mix), np.asarray(d_xla))
    assert int(it1) == int(it2)


def test_sssp_do_mixed_layout_matches():
    """Mixed-layout SSSP DO matches the XLA DO path (interpret mode)."""
    from gunrock_tpu.algorithms.sssp import sssp_kernel_do
    from gunrock_tpu.ops.pallas.semiring import _BIG, pull_layout

    g, A = random_graph(None, n=300, p=0.04, weighted=True, seed_offset=78)
    lay = pull_layout(g, window=128, chunk=128, pad_value=_BIG)
    lay_big = pull_layout(g, window=256, chunk=256, pad_value=_BIG)
    d_xla, _ = sssp_kernel_do(g, 0, edge_budget=64)
    d_mix, _ = sssp_kernel_do(g, 0, edge_budget=64, layout=lay,
                              layout_dense=lay_big, interpret=True)
    np.testing.assert_allclose(np.asarray(d_mix), np.asarray(d_xla),
                               rtol=1e-5)


def test_sparse_minmax_fused():
    """Fused (max, min-of-positives) kernel matches two dense reference
    scans on masked rows (interpret mode)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import (
        _BIG,
        bucketed_semiring_spmv,
        bucketed_semiring_spmv_sparse_minmax,
    )

    g, A = random_graph(None, n=300, p=0.04, weighted=False, seed_offset=9)
    rng = np.random.default_rng(11)
    lay = build_bucketed_layout(
        np.asarray(g.col_indices), np.asarray(g.edge_src),
        np.ones(g.n_edges, np.float32), g.n_vertices, window=128, chunk=128,
    )
    active = jnp.asarray(rng.random(300) < 0.5)
    x = jnp.where(active, jnp.asarray(rng.integers(1, 300, 300)), 0).astype(
        jnp.float32
    )
    ymax, ymin = bucketed_semiring_spmv_sparse_minmax(
        lay, x, active, interpret=True, out_mask=active
    )
    want_max = bucketed_semiring_spmv(lay, x, "max_times", interpret=True)
    # reference min over positive contributions via the inverted-max trick
    big = 1e6
    inv = jnp.where(x > 0, big - x, 0.0)
    inv_max = bucketed_semiring_spmv(lay, inv, "max_times", interpret=True)
    want_min = jnp.where(inv_max > 0, big - inv_max, _BIG)
    am = np.asarray(active)
    np.testing.assert_allclose(np.asarray(ymax)[am], np.asarray(want_max)[am])
    np.testing.assert_allclose(np.asarray(ymin)[am], np.asarray(want_min)[am])


def test_auto_window_chunk_scaling():
    """W doubles above scale 19 so (V/W)^2 chunk metadata fits SMEM."""
    from gunrock_tpu.ops.pallas.layout import auto_window_chunk

    assert auto_window_chunk(1 << 16) == (2048, 256)
    assert auto_window_chunk(1 << 19) == (2048, 256)  # 512Ki = 256*2048
    assert auto_window_chunk((1 << 19) + 1) == (4096, 512)
    assert auto_window_chunk(1 << 20) == (4096, 512)
    assert auto_window_chunk(1 << 21) == (8192, 1024)
    assert auto_window_chunk(1 << 30, interpret=True) == (128, 256)


def test_hostcache_registered_and_fallback():
    import numpy as np

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.io.generators import uniform_graph

    g = uniform_graph(64, avg_degree=4, seed=3)
    # registered at build time: no device read needed, identical content
    cols = hostcache.host(g, "col_indices")
    assert isinstance(cols, np.ndarray)
    np.testing.assert_array_equal(cols, np.asarray(g.col_indices))
    # memoized: same object back
    assert hostcache.host(g, "col_indices") is cols
    # fallback path for an unregistered field
    vals2 = hostcache.host(g, "csc_values")
    np.testing.assert_array_equal(vals2, np.asarray(g.csc_values))
    assert hostcache.host(g, "csc_values") is vals2


def test_sparse_kernels_zero_chunk_layout():
    """An edgeless layout (n_chunks == 0) must return semiring identities
    instead of indexing an empty cumsum (regression: IndexError in the
    active-chunk selection)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.semiring import (
        _BIG,
        bucketed_semiring_spmv_sparse,
        bucketed_semiring_spmv_sparse_minmax,
    )

    V = 16
    layout = build_bucketed_layout(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32),
        V, window=128, chunk=256,
    )
    x = jnp.ones(V, jnp.float32)
    act = jnp.ones(V, bool)
    y = bucketed_semiring_spmv_sparse(layout, x, act, "plus_times", interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.zeros(V, np.float32))
    y = bucketed_semiring_spmv_sparse(layout, x, act, "min_plus", interpret=True)
    assert np.isinf(np.asarray(y)).all()
    ymax, ymin = bucketed_semiring_spmv_sparse_minmax(layout, x, act, interpret=True)
    np.testing.assert_array_equal(np.asarray(ymax), 0.0)
    np.testing.assert_array_equal(np.asarray(ymin), np.float32(_BIG))


def test_paged_semiring_matches_bucketed():
    """Paged-metadata kernel (ops/pallas/paged.py — the SMEM-wall escape
    hatch, docs/design.md §12) must match the scalar-prefetch kernel and
    scipy on every semiring, across page boundaries and rb runs."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.paged import (build_paged_layout,
                                              paged_semiring_spmv)
    from gunrock_tpu.ops.pallas.semiring import _BIG

    g, A = random_graph(None, n=700, p=0.02, weighted=True, seed_offset=90)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    x = np.random.default_rng(1).random(g.n_vertices).astype(np.float32)
    Ad = np.asarray(A.todense())

    lay = build_paged_layout(rows, cols, vals, g.n_vertices,
                             window=128, chunk=256, page=8)
    y = np.asarray(paged_semiring_spmv(lay, jnp.asarray(x), "plus_times",
                                       interpret=True))
    np.testing.assert_allclose(y, Ad @ x, rtol=1e-5, atol=1e-5)

    ymax = np.asarray(paged_semiring_spmv(lay, jnp.asarray(x), "max_times",
                                          interpret=True))
    want_max = np.where((Ad != 0).any(1), (Ad * x[None, :]).max(1,
                        initial=0.0, where=Ad != 0), 0.0)
    np.testing.assert_allclose(ymax, want_max, rtol=1e-5, atol=1e-6)

    layb = build_paged_layout(rows, cols, vals, g.n_vertices,
                              window=128, chunk=256, page=8, pad_value=_BIG)
    xc = np.where(x > 0.5, x, _BIG).astype(np.float32)
    y2 = np.asarray(paged_semiring_spmv(layb, jnp.asarray(xc), "min_plus",
                                        interpret=True))
    w2 = np.full(g.n_vertices, np.inf)
    for r in range(g.n_vertices):
        nz = Ad[r] != 0
        if nz.any():
            w2[r] = (Ad[r][nz] + xc[nz]).min()
    w2 = np.where(w2 >= _BIG, np.inf, w2)
    assert (np.isinf(y2) == np.isinf(w2)).all()
    m = ~np.isinf(w2)
    np.testing.assert_allclose(y2[m], w2[m], rtol=1e-5)


def test_paged_layout_pages_and_runs():
    """Page padding chunks are inert (first=last=0) and run flags
    delimit contiguous rb runs exactly."""
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.paged import build_paged_layout

    g, A = random_graph(None, n=300, p=0.03, weighted=True, seed_offset=91)
    lay = build_paged_layout(
        hostcache.host(g, "edge_src"), hostcache.host(g, "col_indices"),
        hostcache.host(g, "values"), g.n_vertices,
        window=128, chunk=256, page=8,
    )
    meta = np.asarray(lay.meta)
    n = lay.n_chunks
    assert meta.shape[0] == lay.n_pages * lay.page >= n
    assert (meta[n:, 2:4] == 0).all()  # padding never inits or flushes
    rb = meta[:n, 0]
    assert meta[0, 2] == 1 and meta[n - 1, 3] == 1
    np.testing.assert_array_equal(meta[1:n, 2], (rb[1:] != rb[:-1]))
    np.testing.assert_array_equal(meta[: n - 1, 3], (rb[1:] != rb[:-1]))


def test_paged_sparse_matches_dense():
    """Frontier-sparse paged kernel == dense paged kernel on active
    frontiers, all semirings, out_mask and empty-frontier cases."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.paged import (build_paged_layout,
                                              paged_semiring_spmv,
                                              paged_semiring_spmv_sparse)
    from gunrock_tpu.ops.pallas.semiring import _BIG

    g, A = random_graph(None, n=700, p=0.02, weighted=True, seed_offset=90)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    rng = np.random.default_rng(5)
    for sem, pad in (("plus_times", 0.0), ("min_plus", _BIG),
                     ("max_times", 0.0)):
        lay = build_paged_layout(rows, cols, vals, g.n_vertices,
                                 window=128, chunk=256, page=8,
                                 pad_value=pad)
        act = rng.random(g.n_vertices) < 0.3
        base = _BIG if sem == "min_plus" else 0.0
        x = np.where(act, rng.random(g.n_vertices), base).astype(np.float32)
        dense = np.asarray(paged_semiring_spmv(lay, jnp.asarray(x), sem,
                                               interpret=True))
        sparse = np.asarray(paged_semiring_spmv_sparse(
            lay, jnp.asarray(x), jnp.asarray(act), sem, interpret=True))
        d = np.where(np.isinf(dense), 1e30, dense)
        s = np.where(np.isinf(sparse), 1e30, sparse)
        np.testing.assert_allclose(s, d, rtol=1e-5, atol=1e-5)
        om = rng.random(g.n_vertices) < 0.5
        s2 = np.asarray(paged_semiring_spmv_sparse(
            lay, jnp.asarray(x), jnp.asarray(act), sem, interpret=True,
            out_mask=jnp.asarray(om)))
        s2 = np.where(np.isinf(s2), 1e30, s2)
        np.testing.assert_allclose(s2[om], d[om], rtol=1e-5, atol=1e-5)
    z = np.asarray(paged_semiring_spmv_sparse(
        lay, jnp.zeros(g.n_vertices), jnp.zeros(g.n_vertices, bool),
        "plus_times", interpret=True))
    assert (z == 0).all()


def test_paged_layout_through_algorithms():
    """BFS-DO and SSSP-DO run unchanged on a PagedEdges layout (the
    bucketed_semiring_spmv(_sparse) entry points dispatch by type)."""
    import jax.numpy as jnp

    from gunrock_tpu.algorithms.bfs import bfs_kernel_do
    from gunrock_tpu.algorithms.sssp import sssp_kernel_do
    from gunrock_tpu.examples import cpu_reference as cr
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.paged import build_paged_layout
    from gunrock_tpu.ops.pallas.semiring import _BIG

    g, A = random_graph(None, n=500, p=0.03, weighted=True, seed_offset=93)
    cols = hostcache.host(g, "col_indices")
    srcs = hostcache.host(g, "edge_src")
    # pull orientation (rows=dst, cols=src) like semiring.pull_layout
    unit = np.ones(g.n_edges, np.float32)
    lay_bfs = build_paged_layout(cols, srcs, unit, g.n_vertices,
                                 window=128, chunk=256, page=8)
    dist, depth = bfs_kernel_do(g, 0, layout=lay_bfs, interpret=True)
    want = np.asarray(cr.bfs(g, 0))
    np.testing.assert_array_equal(np.asarray(dist), want)

    vals = hostcache.host(g, "values")
    lay_sssp = build_paged_layout(cols, srcs, vals, g.n_vertices,
                                  window=128, chunk=256, page=8,
                                  pad_value=_BIG)
    sdist, _ = sssp_kernel_do(g, 0, layout=lay_sssp, interpret=True)
    import scipy.sparse.csgraph as csg

    swant = csg.dijkstra(A, indices=0)
    np.testing.assert_allclose(np.asarray(sdist), swant, rtol=1e-5,
                               atol=1e-5)


def test_paged_spmm_matches_smem_spmm():
    """Dense paged SpMM == the scalar-prefetch SpMM bit-for-bit (same
    bf16 MXU math, metadata paged) in both hi/lo and exact modes, and
    bucketed_spmm dispatches PagedEdges transparently."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.paged import build_paged_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    g, A = random_graph(None, n=700, p=0.02, weighted=True, seed_offset=90)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    play = build_paged_layout(rows, cols, vals, g.n_vertices,
                              window=128, chunk=256, page=8)
    slay = build_bucketed_layout(rows, cols, vals, g.n_vertices,
                                 window=128, chunk=256)
    rng = np.random.default_rng(2)
    for exact, X in (
        (False, rng.random((g.n_vertices, 8)).astype(np.float32)),
        (True, rng.integers(0, 2, (g.n_vertices, 8)).astype(np.float32)),
    ):
        Yp = np.asarray(bucketed_spmm(play, jnp.asarray(X), interpret=True,
                                      exact=exact))
        Ys = np.asarray(bucketed_spmm(slay, jnp.asarray(X), interpret=True,
                                      exact=exact))
        np.testing.assert_array_equal(Yp, Ys)


def test_paged_spmm_sparse_matches_smem():
    """Frontier-sparse paged SpMM == the scalar-prefetch sparse SpMM
    bit-for-bit (both modes, with and without out_mask) through the
    bucketed_spmm_sparse type dispatch."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.paged import build_paged_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm_sparse

    g, A = random_graph(None, n=700, p=0.02, weighted=True, seed_offset=90)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    play = build_paged_layout(rows, cols, vals, g.n_vertices,
                              window=128, chunk=256, page=8)
    slay = build_bucketed_layout(rows, cols, vals, g.n_vertices,
                                 window=128, chunk=256)
    rng = np.random.default_rng(3)
    act = rng.random(g.n_vertices) < 0.3
    om = rng.random(g.n_vertices) < 0.5
    for exact in (False, True):
        X = (rng.integers(0, 2, (g.n_vertices, 8)) if exact
             else rng.random((g.n_vertices, 8))).astype(np.float32)
        X = np.where(act[:, None], X, 0.0).astype(np.float32)
        for kw in ({}, {"out_mask": jnp.asarray(om)}):
            Yp = np.asarray(bucketed_spmm_sparse(
                play, jnp.asarray(X), jnp.asarray(act), interpret=True,
                exact=exact, **kw))
            Ys = np.asarray(bucketed_spmm_sparse(
                slay, jnp.asarray(X), jnp.asarray(act), interpret=True,
                exact=exact, **kw))
            rows_cmp = om if kw else np.ones(g.n_vertices, bool)
            np.testing.assert_array_equal(Yp[rows_cmp], Ys[rows_cmp])


def test_paged_minmax_matches_smem():
    """Fused max/positives-min paged kernel == the scalar-prefetch
    minmax bit-for-bit (Luby coloring's pass — the last paged twin)."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.layout import build_bucketed_layout
    from gunrock_tpu.ops.pallas.paged import build_paged_layout
    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv_sparse_minmax)

    g, A = random_graph(None, n=700, p=0.02, weighted=True, seed_offset=90)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    play = build_paged_layout(rows, cols, vals, g.n_vertices,
                              window=128, chunk=256, page=8)
    slay = build_bucketed_layout(rows, cols, vals, g.n_vertices,
                                 window=128, chunk=256)
    rng = np.random.default_rng(4)
    act = rng.random(g.n_vertices) < 0.35
    x = np.where(act, rng.random(g.n_vertices) + 0.1, 0.0).astype(np.float32)
    om = rng.random(g.n_vertices) < 0.5
    for kw in ({}, {"out_mask": jnp.asarray(om)}):
        mp = bucketed_semiring_spmv_sparse_minmax(
            play, jnp.asarray(x), jnp.asarray(act), interpret=True, **kw)
        ms = bucketed_semiring_spmv_sparse_minmax(
            slay, jnp.asarray(x), jnp.asarray(act), interpret=True, **kw)
        sel = om if kw else np.ones(g.n_vertices, bool)
        np.testing.assert_array_equal(np.asarray(mp[0])[sel],
                                      np.asarray(ms[0])[sel])
        np.testing.assert_array_equal(np.asarray(mp[1])[sel],
                                      np.asarray(ms[1])[sel])


def test_snake_semiring_matches_bucketed():
    """Snake-order kernel (documented experiment, BASELINE round-4
    negative result) must stay numerically identical to the bucketed
    dispatch for all three semirings."""
    import jax.numpy as jnp
    import numpy as np
    from gunrock_tpu.io.generators import rmat_graph
    from gunrock_tpu.ops.pallas.paged import (build_snake_layout,
                                              snake_semiring_spmv)
    from gunrock_tpu.ops.pallas.semiring import (bucketed_semiring_spmv,
                                                 pull_layout)

    g = rmat_graph(scale=9, edge_factor=12, seed=2)
    x = jnp.asarray(
        np.random.default_rng(1).random(g.n_vertices, dtype=np.float32)
    )
    for sr, pv in (("plus_times", 0.0), ("max_times", 0.0),
                   ("min_plus", float("inf"))):
        ref_lay = pull_layout(g, window=256, chunk=128, pad_value=pv)
        sl = build_snake_layout(
            np.asarray(g.col_indices), np.asarray(g.edge_src),
            np.asarray(g.values), g.n_vertices,
            window=256, chunk=128, page=8, group=4, pad_value=pv,
        )
        y_ref = np.asarray(
            bucketed_semiring_spmv(ref_lay, x, sr, interpret=True)
        )
        y_snk = np.asarray(snake_semiring_spmv(sl, x, sr, interpret=True))
        m = np.isfinite(y_ref)
        np.testing.assert_array_equal(m, np.isfinite(y_snk))
        np.testing.assert_allclose(y_ref[m], y_snk[m], rtol=1e-5, atol=1e-5)


def test_chunkplan_matches_xla_form():
    """The Pallas small-table chunk-activity kernel must reproduce the
    XLA gather form bit-exactly (it replaced it on the hot path of every
    frontier-sparse plan — round 5)."""
    import jax.numpy as jnp

    from gunrock_tpu.ops.pallas.chunkplan import chunk_activity

    rng = np.random.default_rng(7)
    for n_cb, n_rb, n_chunks in ((3, 5, 77), (512, 512, 20000), (1, 1, 1)):
        aw = rng.integers(0, 1 << 32, n_cb, dtype=np.uint32)
        ow = rng.integers(0, 1 << 32, n_rb, dtype=np.uint32)
        cb = rng.integers(0, n_cb, n_chunks).astype(np.int32)
        rb = rng.integers(0, n_rb, n_chunks).astype(np.int32)
        sb = rng.integers(0, 1 << 32, n_chunks, dtype=np.uint32)
        db = rng.integers(0, 1 << 32, n_chunks, dtype=np.uint32)
        for masked in (False, True):
            want = (aw[cb] & sb) != 0
            if masked:
                want &= (ow[rb] & db) != 0
            got = chunk_activity(
                jnp.asarray(aw), jnp.asarray(ow), jnp.asarray(cb),
                jnp.asarray(rb), jnp.asarray(sb), jnp.asarray(db),
                masked=masked, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(got), want,
                                          err_msg=f"{n_chunks}/{masked}")
