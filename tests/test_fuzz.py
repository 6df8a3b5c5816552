"""Randomized differential tests: odd graph shapes through every
strategy pair, checked against scipy/networkx oracles or cross-checked
XLA-vs-Pallas. Catches corner cases the hand-picked fixtures miss
(disconnected blobs, stars, near-cliques, duplicate weights, self loops,
isolated tails) — the reference's test strategy has nothing comparable
(SURVEY §4: its CI is compile-only).
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as sp

from gunrock_tpu.formats import Coo, coo_to_csr
from gunrock_tpu.graph import build_graph
from gunrock_tpu.graph.properties import GraphProperties
from gunrock_tpu.ops.configs import LoadBalance, Options


def _odd_graph(seed: int):
    """A deliberately awkward graph: mixture of a dense core, a star, a
    path, isolated vertices, self loops and duplicate weights."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 90))
    dense = (rng.random((n, n)) < rng.uniform(0.02, 0.2)).astype(np.float32)
    hub = int(rng.integers(0, n))
    dense[hub, : n // 2] = 1.0  # star
    for i in range(0, n - 1, 7):  # path threads
        dense[i, i + 1] = 1.0
    dense[: n // 8, :] = 0.0  # isolated head block
    dense[:, : n // 8] = 0.0
    if rng.random() < 0.5:
        np.fill_diagonal(dense, rng.random(n) < 0.2)  # some self loops
    dense = np.maximum(dense, dense.T)  # symmetric
    w = np.round(rng.random((n, n)) * 4 + 0.5, 1).astype(np.float32)
    w = np.triu(w) + np.triu(w, 1).T  # symmetric weights, many duplicates
    mat = dense * w
    sp_mat = sp.csr_matrix(mat)
    coo = sp_mat.tocoo()
    g = build_graph(
        coo_to_csr(Coo(
            n_rows=n, n_cols=n,
            row_indices=coo.row.astype(np.int32),
            col_indices=coo.col.astype(np.int32),
            values=coo.data.astype(np.float32),
        )),
        GraphProperties(directed=False, weighted=True, symmetric=True),
    )
    return g, sp_mat


LBS = (LoadBalance.XLA_SEGMENT, LoadBalance.PALLAS_MERGE_PATH)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_bfs_sssp(seed):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.algorithms import bfs, sssp

    g, A = _odd_graph(seed)
    src = seed % g.n_vertices
    hops_want = csg.shortest_path(
        (A != 0).astype(np.float32), unweighted=True, indices=src
    )
    dist_want = csg.dijkstra(A, indices=src)
    for lb in LBS:
        opt = Options(load_balance=lb)
        db = np.asarray(bfs.run(g, src, options=opt, warmup=False).distances)
        reach = np.isfinite(hops_want)
        assert (db[reach] == hops_want[reach]).all(), (seed, lb)
        assert (db[~reach] >= g.n_vertices).all() or (
            db[~reach] == np.iinfo(np.int32).max
        ).all(), (seed, lb)
        ds = np.asarray(sssp.run(g, src, options=opt, warmup=False).distances)
        np.testing.assert_allclose(
            ds[reach], dist_want[reach], rtol=1e-5, err_msg=f"{seed} {lb}"
        )


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_color_kcore(seed):
    import networkx as nx

    from gunrock_tpu.algorithms import color, kcore

    g, A = _odd_graph(seed + 100)
    coo = A.tocoo()
    off = coo.row != coo.col
    for lb in LBS:
        opt = Options(load_balance=lb)
        for strategy in ("luby", "rank", "greedy"):
            c = np.asarray(
                color.run(g, options=opt, warmup=False,
                          strategy=strategy).colors
            )
            assert (c >= 0).all(), (seed, lb, strategy)
            assert (c[coo.row[off]] != c[coo.col[off]]).all(), (
                seed, lb, strategy,
            )
        cores = np.asarray(kcore.run(g, options=opt, warmup=False).k_cores)
        G = nx.from_scipy_sparse_array(A)
        G.remove_edges_from(nx.selfloop_edges(G))
        want = nx.core_number(G)
        # reference parity: peeling starts at k=1, so isolated vertices
        # (networkx core 0) get core 1 (kcore.hxx:139-150 semantics)
        assert all(cores[v] == max(want[v], 1) for v in G.nodes), (seed, lb)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_tc_directed(seed):
    """Directed inputs: TC counts triangles of the symmetrized graph
    (documented deviation; the reference silently miscounts)."""
    import networkx as nx

    from gunrock_tpu.algorithms import tc

    rng = np.random.default_rng(seed + 700)
    n = int(rng.integers(30, 70))
    dense = (rng.random((n, n)) < 0.1).astype(np.float32)
    np.fill_diagonal(dense, (rng.random(n) < 0.2))  # self loops too
    sp_mat = sp.csr_matrix(dense)
    coo = sp_mat.tocoo()
    g = build_graph(
        coo_to_csr(Coo(
            n_rows=n, n_cols=n,
            row_indices=coo.row.astype(np.int32),
            col_indices=coo.col.astype(np.int32),
            values=coo.data.astype(np.float32),
        )),
        GraphProperties(directed=True, weighted=False, symmetric=False),
    )
    res = tc.run(g, warmup=False)
    G = nx.from_scipy_sparse_array(
        sp.csr_matrix(np.maximum(dense, dense.T))
    )
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = np.asarray(res.vertex_triangles_count)
    assert all(got[v] == want[v] for v in G.nodes), seed


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_sssp_delta_stepping(seed):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.algorithms import sssp
    from gunrock_tpu.ops.configs import LoadBalance

    g, A = _odd_graph(seed + 500)
    src = (seed * 13) % g.n_vertices
    want = csg.dijkstra(A, indices=src)
    res = sssp.run(
        g, src, options=Options(load_balance=LoadBalance.BUCKETING),
        warmup=False,
    )
    got = np.asarray(res.distances)
    reach = np.isfinite(want)
    np.testing.assert_allclose(got[reach], want[reach], rtol=1e-5)
    assert np.isinf(got[~reach]).all() or (got[~reach] > 1e37).all()


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_tc_spmv(seed):
    import networkx as nx

    from gunrock_tpu.algorithms import spmv, tc

    g, A = _odd_graph(seed + 300)
    res = tc.run(g, warmup=False)
    G = nx.from_scipy_sparse_array(A)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = np.asarray(res.vertex_triangles_count)
    assert all(got[v] == want[v] for v in G.nodes), seed

    rng = np.random.default_rng(seed)
    x = rng.random(g.n_vertices).astype(np.float32)
    for lb in LBS:
        y = np.asarray(
            spmv.run(g, x, options=Options(load_balance=lb), warmup=False).y
        )
        np.testing.assert_allclose(
            y, A @ x, rtol=2e-4, atol=1e-5, err_msg=f"{seed} {lb}"
        )


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_msbfs_matches_single(seed):
    """Batched multi-source BFS (SpMM K-axis, exact-bf16 frontiers) ==
    K independent single-source runs, on odd graphs."""
    import jax.numpy as jnp

    from gunrock_tpu.algorithms import bfs
    from gunrock_tpu.algorithms.bfs import UNREACHED, msbfs_kernel

    g, A = _odd_graph(seed + 400)
    K = 8
    rng = np.random.default_rng(seed)
    srcs = rng.integers(0, g.n_vertices, K).astype(np.int32)
    dist, _ = msbfs_kernel(g, jnp.asarray(srcs), interpret=True)
    dist = np.asarray(dist)
    for k, s in enumerate(srcs):
        want = np.asarray(bfs.run(g, int(s), warmup=False).distances)
        got = dist[:, k]
        reach = want != int(UNREACHED)
        assert (got[reach] == want[reach]).all(), (seed, k)
        assert (got[~reach] == int(UNREACHED)).all(), (seed, k)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_mst_pr(seed):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.algorithms import mst, pr

    g, A = _odd_graph(seed + 200)
    res = mst.run(g, warmup=False)
    want = csg.minimum_spanning_tree(sp.triu(A)).sum()
    assert abs(res.mst_weight - want) < 1e-3 * max(1.0, abs(want)), seed
    # chosen-edge mask must reproduce the weight and form a forest
    mask = np.asarray(res.mst_edges)
    src = np.asarray(g.edge_src)[mask]
    dst = np.asarray(g.col_indices)[mask]
    w = np.asarray(g.values)[mask]
    assert abs(w.sum() - res.mst_weight) < 1e-3 * max(1.0, abs(want)), seed
    n_edges = mask.sum()
    assert n_edges == g.n_vertices - res.n_components, seed
    for lb in LBS:
        p = np.asarray(
            pr.run(g, options=Options(load_balance=lb), warmup=False).p
        )
        assert np.isfinite(p).all() and (p >= 0).all(), (seed, lb)
        assert abs(p.sum() - 1.0) < 1e-3, (seed, lb)


@pytest.mark.parametrize("seed", range(210, 216))
def test_fuzz_paged_kernels(seed):
    """Paged-metadata kernels vs scipy on odd shapes (self loops,
    isolated blocks, stars): dense and frontier-sparse, plus_times and
    min_plus, at a tiny window/page so every boundary case (partial
    pages, single-chunk runs, empty row blocks) is exercised."""
    import jax.numpy as jnp

    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.paged import (build_paged_layout,
                                              paged_semiring_spmv,
                                              paged_semiring_spmv_sparse)
    from gunrock_tpu.ops.pallas.semiring import _BIG

    g, sp_mat = _odd_graph(seed)
    rng = np.random.default_rng(seed)
    rows = hostcache.host(g, "edge_src")
    cols = hostcache.host(g, "col_indices")
    vals = hostcache.host(g, "values")
    x = rng.random(g.n_vertices).astype(np.float32)
    Ad = np.asarray(sp_mat.todense())

    lay = build_paged_layout(rows, cols, vals, g.n_vertices,
                             window=128, chunk=256, page=4)
    y = np.asarray(paged_semiring_spmv(lay, jnp.asarray(x), "plus_times",
                                       interpret=True))
    np.testing.assert_allclose(y, Ad @ x, rtol=1e-4, atol=1e-5)

    act = rng.random(g.n_vertices) < 0.4
    xs = np.where(act, x, 0.0).astype(np.float32)
    ys = np.asarray(paged_semiring_spmv_sparse(
        lay, jnp.asarray(xs), jnp.asarray(act), "plus_times",
        interpret=True))
    np.testing.assert_allclose(ys, Ad @ xs, rtol=1e-4, atol=1e-5)

    layb = build_paged_layout(rows, cols, vals, g.n_vertices,
                              window=128, chunk=256, page=4,
                              pad_value=_BIG)
    xm = np.where(act, x, _BIG).astype(np.float32)
    ym = np.asarray(paged_semiring_spmv_sparse(
        layb, jnp.asarray(xm), jnp.asarray(act), "min_plus",
        interpret=True))
    w = np.full(g.n_vertices, np.inf)
    for r in range(g.n_vertices):
        nz = Ad[r] != 0
        if nz.any():
            w[r] = (Ad[r][nz] + xm[nz]).min()
    w = np.where(w >= _BIG, np.inf, w)
    assert (np.isinf(ym) == np.isinf(w)).all()
    m = ~np.isinf(w)
    np.testing.assert_allclose(ym[m], w[m], rtol=1e-4)


@pytest.mark.parametrize("seed", range(220, 226))
def test_fuzz_async_sweeps(seed):
    """Async Gauss-Seidel sweeps vs oracles on odd shapes, both
    orderings and odd block counts."""
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.examples import cpu_reference as cr
    from gunrock_tpu.experimental.async_sweep import bfs_async, sssp_async

    g, sp_mat = _odd_graph(seed)
    nb = int(np.random.default_rng(seed).integers(1, 17))
    d, _, _ = sssp_async(g, 0, n_blocks=nb)
    want = csg.dijkstra(sp_mat, indices=0)
    np.testing.assert_allclose(np.asarray(d), want, rtol=1e-5, atol=1e-5)
    dep, _, _ = bfs_async(g, 0, n_blocks=nb, ordering="rcm")
    np.testing.assert_array_equal(np.asarray(dep), np.asarray(cr.bfs(g, 0)))


@pytest.mark.parametrize("case", [3, 11, 27])
def test_semiring_version_parity_odd_graphs(case):
    """v1 / v4 / v5 (+exact) must agree on the odd-graph family for all
    three semirings — the dynamic-gather kernels' tiling and the MXU
    scatter must not care about degenerate window occupancy."""
    import jax.numpy as jnp
    import numpy as np

    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv, bucketed_semiring_spmv_sparse, pull_layout)

    g, _ = _odd_graph(case)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random(g.n_vertices, dtype=np.float32))
    act = jnp.asarray(rng.random(g.n_vertices) < 0.5)
    ones = jnp.ones(g.n_vertices, jnp.float32)
    for sr, pv in (("plus_times", 0.0), ("max_times", 0.0),
                   ("min_plus", float("inf"))):
        lay = pull_layout(g, window=256, chunk=128, pad_value=pv)
        xs = jnp.where(act, x, jnp.inf if sr == "min_plus" else 0.0)
        ref_d = np.asarray(
            bucketed_semiring_spmv(lay, x, sr, interpret=True, version=1))
        ref_s = np.asarray(bucketed_semiring_spmv_sparse(
            lay, xs, act, sr, interpret=True, version=1))
        for v in (4, 5):
            got_d = np.asarray(bucketed_semiring_spmv(
                lay, x, sr, interpret=True, version=v))
            got_s = np.asarray(bucketed_semiring_spmv_sparse(
                lay, xs, act, sr, interpret=True, version=v))
            for a, b in ((ref_d, got_d), (ref_s, got_s)):
                m = np.isfinite(a)
                np.testing.assert_array_equal(m, np.isfinite(b))
                np.testing.assert_allclose(a[m], b[m], rtol=1e-4,
                                           atol=1e-5)
        if sr == "plus_times":
            # exact path: bit-identical COUNTS on a UNIT layout with 0/1
            # inputs (the contract: bf16-exact messages — kcore's peel
            # counts, BFS reach; weighted layouts must NOT pass exact)
            ulay = pull_layout(g, window=256, chunk=128, unit=True)
            a1 = jnp.where(act, 1.0, 0.0)
            cnt1 = np.asarray(bucketed_semiring_spmv_sparse(
                ulay, a1, act, sr, interpret=True, version=1))
            cnt5 = np.asarray(bucketed_semiring_spmv_sparse(
                ulay, a1, act, sr, interpret=True, version=5, exact=True))
            np.testing.assert_array_equal(cnt1, cnt5)
