"""BC / PPR / MST vs independent oracles (networkx, exact linear solves)."""

import numpy as np
import pytest

from tests.conftest import random_graph


# ---------------------------------------------------------------- BC
def test_bc_single_source_matches_brandes():
    import networkx as nx

    from gunrock_tpu.algorithms import bc

    g, sp_mat = random_graph(None, n=40, p=0.12, symmetric=True, seed_offset=21)
    res = bc.run(g, 0, warmup=False)
    # Brandes single-source dependencies, computed by networkx's
    # accumulation: run full BC on a graph where only source 0 counts.
    G = nx.from_scipy_sparse_array(sp_mat)
    G.remove_edges_from(nx.selfloop_edges(G))
    # manual single-source Brandes (unweighted)
    want = _brandes_single_source(G, 0)
    np.testing.assert_allclose(np.asarray(res.bc_values), want, atol=1e-4)


def test_bc_deep_mesh_dynamic_range():
    """High-diameter mesh: path counts reach ~2^depth (sigma spans 18+
    orders of magnitude at side 48), which catastrophically cancelled the
    old cumsum-difference segmented sums — BC was off by 1e13x on road-
    network-shaped graphs (round-3 regression-suite find). Locks the
    within-segment scatter-add form in bc.py AND parallel/sharded.py."""
    from gunrock_tpu.algorithms import bc
    from gunrock_tpu.examples import cpu_reference as cr
    from gunrock_tpu.io.generators import grid2d_graph
    from gunrock_tpu.parallel import sharded
    from gunrock_tpu.parallel.mesh import make_mesh

    g = grid2d_graph(48, weighted=True)
    want = np.asarray(cr.bc(g, 0))
    got = np.asarray(bc.run(g, 0, warmup=False).bc_values)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    mesh = make_mesh(8)
    sg = sharded.partition_sharded(g, 8, mesh, use_halo=False)
    sgot = np.asarray(sharded.bc(sg, 0, mesh))
    np.testing.assert_allclose(sgot, want, rtol=1e-4, atol=1e-4)


def test_bc_pallas_matches_xla():
    """The frontier-sparse Pallas BC path == the XLA segment path, on
    symmetric and directed inputs."""
    from gunrock_tpu.algorithms import bc
    from gunrock_tpu.ops.configs import LoadBalance, Options

    for symmetric in (True, False):
        g, _ = random_graph(
            None, n=80, p=0.1, symmetric=symmetric, seed_offset=21
        )
        a = bc.run(g, 3, options=Options(), warmup=False)
        b = bc.run(
            g, 3, options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
            warmup=False,
        )
        np.testing.assert_allclose(
            np.asarray(a.bc_values), np.asarray(b.bc_values), atol=1e-4,
        )


def _brandes_single_source(G, s):
    import collections

    V = G.number_of_nodes()
    sigma = np.zeros(V)
    dist = np.full(V, -1)
    sigma[s] = 1.0
    dist[s] = 0
    order = []
    q = collections.deque([s])
    preds = [[] for _ in range(V)]
    while q:
        v = q.popleft()
        order.append(v)
        for u in G.neighbors(v):
            if dist[u] < 0:
                dist[u] = dist[v] + 1
                q.append(u)
            if dist[u] == dist[v] + 1:
                sigma[u] += sigma[v]
                preds[u].append(v)
    delta = np.zeros(V)
    for v in reversed(order):
        for u in preds[v]:
            delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
    delta[s] = 0.0
    return 0.5 * delta


def test_bc_all_sources_matches_networkx():
    import networkx as nx

    from gunrock_tpu.algorithms import bc

    g, sp_mat = random_graph(None, n=30, p=0.15, symmetric=True, seed_offset=22)
    res = bc.run_all_sources(g, chunk_size=8, warmup=False)
    G = nx.from_scipy_sparse_array(sp_mat)
    G.remove_edges_from(nx.selfloop_edges(G))
    want_dict = nx.betweenness_centrality(G, normalized=False)
    want = np.array([want_dict[v] for v in range(30)])
    np.testing.assert_allclose(np.asarray(res.bc_values), want, atol=1e-3)


# ---------------------------------------------------------------- PPR
def test_ppr_matches_exact_personalized_pagerank():
    from gunrock_tpu.algorithms import ppr

    g, sp_mat = random_graph(None, n=30, p=0.2, symmetric=True, seed_offset=23)
    alpha, eps = 0.15, 1e-9
    res = ppr.run(g, seed=3, alpha=alpha, epsilon=eps, warmup=False)
    # exact Andersen PPR over the lazy walk W = (I + P)/2 (the convention
    # implied by the reference's 2a/(1+a), (1-a)/(1+a) push coefficients):
    # p = alpha * e_s (I - (1-alpha) W)^{-1}
    A = (sp_mat.toarray() != 0).astype(np.float64)
    deg = A.sum(axis=1)
    assert (deg > 0).all(), "test graph must have no dangling vertices"
    P = A / deg[:, None]
    V = A.shape[0]
    W = (np.eye(V) + P) / 2
    e = np.zeros(V)
    e[3] = 1.0
    exact = alpha * e @ np.linalg.inv(np.eye(V) - (1 - alpha) * W)
    np.testing.assert_allclose(np.asarray(res.p), exact, atol=1e-5)


def test_ppr_pallas_matches_xla():
    """The frontier-sparse Pallas PPR push == the XLA cumsum path."""
    from gunrock_tpu.algorithms import ppr
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g, _ = random_graph(None, n=90, p=0.08, symmetric=True, seed_offset=23)
    a = ppr.run(g, 2, options=Options(), warmup=False)
    b = ppr.run(
        g, 2, options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
        warmup=False,
    )
    assert a.iterations == b.iterations
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=1e-5)


def test_ppr_batch_shape():
    from gunrock_tpu.algorithms import ppr

    g, _ = random_graph(None, n=30, p=0.2, symmetric=True, seed_offset=23)
    p, _ = ppr.run_batch(g, [0, 3, 7], epsilon=1e-4, warmup=False)
    assert p.shape == (3, 30)
    assert (np.asarray(p) >= 0).all()


# ---------------------------------------------------------------- MST
def test_mst_matches_networkx():
    import networkx as nx

    from gunrock_tpu.algorithms import mst

    g, sp_mat = random_graph(None, n=50, p=0.15, symmetric=True, seed_offset=24)
    res = mst.run(g, warmup=False)
    G = nx.from_scipy_sparse_array(sp_mat)
    G.remove_edges_from(nx.selfloop_edges(G))
    T = nx.minimum_spanning_tree(G)
    want = T.size(weight="weight")
    assert abs(res.mst_weight - want) < 1e-3, (res.mst_weight, want)
    # edge mask count equals V - n_components
    n_edges_mst = int(np.asarray(res.mst_edges).sum())
    assert n_edges_mst == 50 - res.n_components


def test_mst_directed_canonicalized_and_relabel_invariant():
    """Regression: a DIRECTED CSR fed to Borůvka used to lose every
    (u, v) edge with u > v (the symmetric-storage src<dst cut test),
    producing a short forest whose weight depended on the vertex
    labeling. run() now canonicalizes directed inputs (min weight per
    unordered pair); the forest weight must match scipy and be
    invariant under degree-sort relabeling."""
    from scipy.sparse.csgraph import minimum_spanning_tree

    from gunrock_tpu.algorithms import mst
    from gunrock_tpu.graph.reorder import degree_sort

    g, sp_mat = random_graph(None, n=60, p=0.08, symmetric=False, seed_offset=31)
    want = float(minimum_spanning_tree(sp_mat).sum())
    a = mst.run(g, warmup=False)
    rg, _ = degree_sort(g)
    b = mst.run(rg, warmup=False)
    assert abs(a.mst_weight - want) < 1e-3 * max(1.0, abs(want)), (a.mst_weight, want)
    assert abs(b.mst_weight - a.mst_weight) < 1e-3
    assert a.n_components == b.n_components


def test_mst_forest_on_disconnected():
    import networkx as nx
    import scipy.sparse as sp

    from gunrock_tpu.algorithms import mst
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    # two disjoint triangles
    rows = np.array([0, 1, 0, 2, 1, 2, 3, 4, 3, 5, 4, 5], np.int32)
    cols = np.array([1, 0, 2, 0, 2, 1, 4, 3, 5, 3, 5, 4], np.int32)
    vals = np.array([1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6], np.float32)
    gph = build_graph(
        coo_to_csr(Coo(6, 6, rows, cols, vals)),
        GraphProperties(directed=False, weighted=True, symmetric=True),
    )
    res = mst.run(gph, warmup=False)
    assert res.n_components == 2
    assert abs(res.mst_weight - (1 + 2 + 4 + 5)) < 1e-5
    with pytest.raises(RuntimeError):
        mst.run(gph, require_connected=True, warmup=False)


def test_bc_all_sources_spmm_matches_vmapped():
    """Batched-SpMM BC (MXU path) vs the vmapped reference path."""
    from gunrock_tpu.algorithms import bc

    g, _ = random_graph(None, n=50, p=0.12, symmetric=True, seed_offset=22)
    want = bc.run_all_sources(g, chunk_size=10, warmup=False)
    got = bc.run_all_sources_spmm(g, chunk_size=16)
    np.testing.assert_allclose(
        np.asarray(got.bc_values), np.asarray(want.bc_values), atol=1e-3
    )


def test_edge_cases_single_vertex_no_edges():
    """Every algorithm must handle V=1, E=0 without crashing."""
    from gunrock_tpu.algorithms import (
        bfs, color, hits, kcore, mst, ppr, pr, spmv, sssp, tc,
    )
    from gunrock_tpu.graph import build_graph_from_arrays
    from gunrock_tpu.graph.properties import GraphProperties

    g = build_graph_from_arrays(
        1, np.array([0, 0], np.int32), np.array([], np.int32),
        properties=GraphProperties(directed=False, symmetric=True),
    )
    assert int(bfs.run(g, 0, warmup=False).distances[0]) == 0
    assert float(sssp.run(g, 0, warmup=False).distances[0]) == 0.0
    assert abs(float(pr.run(g, warmup=False).p[0]) - 1.0) < 0.2
    assert int(kcore.run(g, warmup=False).k_cores[0]) == 1
    assert int(color.run(g, warmup=False).colors[0]) >= 0
    assert tc.run(g, warmup=False).n_triangles == 0
    r = mst.run(g, warmup=False)
    assert r.mst_weight == 0.0 and r.n_components == 1
    hits.run(g, max_iterations=3, warmup=False)
    spmv.run(g, np.ones(1, np.float32), warmup=False)
    ppr.run(g, 0, warmup=False)


def test_ppr_batch_spmm_matches_vmap():
    from gunrock_tpu.algorithms import ppr

    g, _ = random_graph(None, n=100, p=0.08, symmetric=True, seed_offset=200)
    p1, _ = ppr.run_batch(g, [0, 5, 9], epsilon=1e-6, warmup=False, use_spmm=False)
    p2, _ = ppr.run_batch(g, [0, 5, 9], epsilon=1e-6, warmup=False, use_spmm=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)


def test_tc_sortjoin_matches_probe_and_networkx():
    """The device sort-merge-join TC (round-2 kernel) must agree with the
    batched binary-search kernel and networkx, on symmetric AND directed
    (symmetrized-internally) inputs."""
    import networkx as nx

    from gunrock_tpu.algorithms import tc

    for sym, so in [(True, 81), (False, 82)]:
        g, A = random_graph(None, n=180, p=0.07, symmetric=sym, seed_offset=so)
        r1 = tc.run(g, warmup=False, method="sortjoin")
        r2 = tc.run(g, warmup=False, method="probe")
        np.testing.assert_array_equal(
            np.asarray(r1.vertex_triangles_count),
            np.asarray(r2.vertex_triangles_count),
        )
        G = nx.from_scipy_sparse_array(A.maximum(A.T))
        G.remove_edges_from(nx.selfloop_edges(G))
        want = sum(nx.triangles(G).values()) // 3
        assert r1.n_triangles == want, (sym, r1.n_triangles, want)


def test_tc_slabbed_sortjoin_matches_default():
    """The big-graph wedge-slabbed sort-join (forced via a tiny
    max_wedges) must reproduce the single-sort counts exactly — the
    per-corner counts are additive across wedge slabs."""
    import numpy as np

    from gunrock_tpu.algorithms import tc
    from gunrock_tpu.io.generators import rmat_graph

    g = rmat_graph(scale=9, edge_factor=10, seed=2, undirected=True)
    r0 = tc.run(g, warmup=False)
    r1 = tc.run(g, warmup=False, max_wedges=500)
    np.testing.assert_array_equal(
        np.asarray(r0.vertex_triangles_count),
        np.asarray(r1.vertex_triangles_count),
    )
    assert r0.n_triangles == r1.n_triangles
