"""Asynchronous-semantics Gauss-Seidel sweep solver vs oracles (the
reference experimental async runtime's role — SURVEY §2.7; previously a
declared non-goal, now implemented as deterministic block sweeps)."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csg

from tests.conftest import random_graph


def _to_scipy(g):
    from gunrock_tpu.graph import hostcache

    off = hostcache.host(g, "row_offsets")
    col = hostcache.host(g, "col_indices")
    val = hostcache.host(g, "values")
    return sp.csr_matrix((val, col, off), shape=(g.n_vertices, g.n_vertices))


def test_async_sssp_matches_dijkstra():
    from gunrock_tpu.experimental.async_sweep import sssp_async
    from gunrock_tpu.io.generators import grid2d_graph, rmat_graph

    for g in (grid2d_graph(32, weighted=True), rmat_graph(10, 8, seed=2)):
        A = _to_scipy(g)
        d, sweeps, passes = sssp_async(g, 0)
        want = csg.dijkstra(A, indices=0)
        np.testing.assert_allclose(np.asarray(d), want, rtol=1e-5, atol=1e-5)
        assert sweeps >= 1 and passes >= sweeps


def test_async_bfs_beats_bsp_levels_on_grids():
    """The async schedule's reason to exist: on high-diameter meshes the
    BSP kernels pay one full pass per LEVEL, the sweeps converge in a
    handful of passes. grid 64x64: 126 BSP levels; the sweep solver must
    finish in <= 4 sweeps and <= 15 full-pass equivalents of work."""
    from gunrock_tpu.examples import cpu_reference as cr
    from gunrock_tpu.experimental.async_sweep import bfs_async
    from gunrock_tpu.io.generators import grid2d_graph

    g = grid2d_graph(64, weighted=True)
    depth, sweeps, passes = bfs_async(g, 0, n_blocks=32)
    want = np.asarray(cr.bfs(g, 0))
    np.testing.assert_array_equal(np.asarray(depth), want)
    assert want[want < 2**31 - 1].max() == 126  # the BSP level count
    assert sweeps <= 4, sweeps
    assert passes / 32 <= 15, passes


def test_async_rcm_ordering_on_scrambled_mesh():
    """Random vertex ids break path monotonicity; ordering='rcm'
    restores it (delaunay2k measured 19 -> 7 sweeps). Results map back
    to input ids."""
    from gunrock_tpu.experimental.async_sweep import bfs_async, sssp_async
    from gunrock_tpu.io.generators import delaunay_graph

    g = delaunay_graph(512, seed=3)
    A = _to_scipy(g)
    d_nat, s_nat, _ = sssp_async(g, 5)
    d_rcm, s_rcm, _ = sssp_async(g, 5, ordering="rcm")
    want = csg.dijkstra(A, indices=5)
    np.testing.assert_allclose(np.asarray(d_nat), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_rcm), want, rtol=1e-5, atol=1e-5)
    assert s_rcm <= s_nat
    dep, s2, _ = bfs_async(g, 5, ordering="rcm")
    from gunrock_tpu.examples import cpu_reference as cr

    np.testing.assert_array_equal(np.asarray(dep), np.asarray(cr.bfs(g, 5)))


def test_async_odd_shapes():
    """Disconnected graphs, self loops, single-vertex blocks."""
    from gunrock_tpu.experimental.async_sweep import bfs_async, sssp_async
    from tests.test_fuzz import _odd_graph

    g, A = _odd_graph(7)
    d, sweeps, _ = sssp_async(g, 0, n_blocks=8)
    want = csg.dijkstra(sp.csr_matrix(A), indices=0)
    np.testing.assert_allclose(np.asarray(d), want, rtol=1e-5, atol=1e-5)
    dep, _, _ = bfs_async(g, 0, n_blocks=8)
    from gunrock_tpu.examples import cpu_reference as cr

    np.testing.assert_array_equal(np.asarray(dep), np.asarray(cr.bfs(g, 0)))


def test_async_cli_flags():
    """--mode async on the bfs/sssp drivers with --validate."""
    from gunrock_tpu.examples import bfs as bfs_cli
    from gunrock_tpu.examples import sssp as sssp_cli

    chesapeake = "/root/repo/datasets/chesapeake.mtx"
    bfs_cli.main(["--market", chesapeake, "--src", "0", "--mode", "async",
                  "--validate"])
    sssp_cli.main(["--market", chesapeake, "--src", "0", "--mode", "async",
                   "--ordering", "rcm", "--validate"])


def test_async_pagerank_gauss_seidel():
    """Gauss-Seidel PR sweeps: same unique fixed point as the Jacobi
    power iteration, and measurably CLOSER to the f64 fixed point at the
    same nominal tol (Jacobi's consecutive-iterate delta underestimates
    the distance to the fixed point by ~1/(1-alpha); GS's within-sweep
    freshness does not). n_blocks=1 must reduce exactly to Jacobi."""
    from gunrock_tpu.algorithms import pr
    from gunrock_tpu.experimental.async_sweep import pr_async
    from gunrock_tpu.io.generators import rmat_graph

    g = rmat_graph(10, 8, seed=2)
    A = _to_scipy(g).astype(np.float64)
    V = g.n_vertices
    outw = np.asarray(A.sum(axis=1)).ravel()
    iw = np.where(outw != 0, 1 / np.maximum(outw, 1e-300), 0.0)
    p = np.full(V, 1 / V)
    for _ in range(2000):
        dsum = 0.85 * p[outw == 0].sum()
        pn = (1 - 0.85 + dsum) / V + 0.85 * A.T.dot(p * iw)
        if np.abs(pn - p).max() < 1e-13:
            break
        p = pn

    p_gs, sweeps = pr_async(g, tol=1e-7, n_blocks=16)
    gs_err = float(np.max(np.abs(np.asarray(p_gs, np.float64) - p) / p))
    assert gs_err < 1e-4, gs_err
    ref = pr.run(g, tol=1e-7, warmup=False)
    np.testing.assert_allclose(np.asarray(p_gs), np.asarray(ref.p),
                               rtol=1e-2, atol=1e-6)
    p1, s1 = pr_async(g, tol=1e-6, n_blocks=1)
    assert s1 == pr.run(g, tol=1e-6, warmup=False).iterations
