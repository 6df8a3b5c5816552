"""SpMV / HITS / coloring / k-core / TC vs independent oracles
(scipy, networkx, and the reference's literal unit-test graphs —
mirroring unittests/algorithms/tc.cuh style)."""

import numpy as np
import pytest

from tests.conftest import random_graph


# ---------------------------------------------------------------- SpMV
def test_spmv_matches_scipy():
    from gunrock_tpu.algorithms import spmv

    g, sp_mat = random_graph(None, n=80, p=0.1, weighted=True, seed_offset=11)
    x = np.random.default_rng(3).random(80).astype(np.float32)
    res = spmv.run(g, x, warmup=False)
    np.testing.assert_allclose(np.asarray(res.y), sp_mat @ x, rtol=1e-5)


def test_spmv_pull_symmetric():
    from gunrock_tpu.algorithms.spmv import spmv_kernel, spmv_pull_kernel

    g, sp_mat = random_graph(None, n=50, p=0.15, symmetric=True, seed_offset=12)
    x = np.random.default_rng(4).random(50).astype(np.float32)
    import jax.numpy as jnp

    push = np.asarray(spmv_kernel(g, jnp.asarray(x)))
    pull = np.asarray(spmv_pull_kernel(g, jnp.asarray(x)))
    np.testing.assert_allclose(push, pull, rtol=1e-5)
    np.testing.assert_allclose(push, sp_mat @ x, rtol=1e-4)


# ---------------------------------------------------------------- HITS
def _hits_oracle(adj, iters):
    """Reference semantics: both updates from current vectors, L2 norm."""
    V = adj.shape[0]
    auth = np.ones(V)
    hub = np.ones(V)
    for _ in range(iters):
        hub_n = adj @ auth  # hub[src] = sum over out-edges of auth[dst]
        auth_n = adj.T @ hub  # auth[dst] = sum over in-edges of hub[src]
        auth = auth_n / (np.linalg.norm(auth_n) or 1.0)
        hub = hub_n / (np.linalg.norm(hub_n) or 1.0)
    return auth, hub


def test_hits_matches_oracle():
    from gunrock_tpu.algorithms import hits

    g, sp_mat = random_graph(None, n=60, p=0.1, weighted=False, seed_offset=13)
    adj = (sp_mat.toarray() != 0).astype(np.float64)
    res = hits.run(g, max_iterations=30, warmup=False)
    want_auth, want_hub = _hits_oracle(adj, res.iterations)
    np.testing.assert_allclose(np.asarray(res.auth), want_auth, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.hub), want_hub, atol=1e-4)


# ---------------------------------------------------------------- Color
def test_color_is_proper():
    from gunrock_tpu.algorithms import color

    g, sp_mat = random_graph(None, n=70, p=0.1, symmetric=True, seed_offset=14)
    res = color.run(g, warmup=False)
    colors = np.asarray(res.colors)
    assert (colors >= 0).all(), "every vertex colored"
    coo = sp_mat.tocoo()
    off_diag = coo.row != coo.col
    assert (colors[coo.row[off_diag]] != colors[coo.col[off_diag]]).all(), (
        "adjacent vertices share a color"
    )


# ---------------------------------------------------------------- KCore
def test_kcore_matches_networkx():
    import networkx as nx

    from gunrock_tpu.algorithms import kcore

    g, sp_mat = random_graph(None, n=60, p=0.12, symmetric=True, seed_offset=15)
    res = kcore.run(g, warmup=False)
    G = nx.from_scipy_sparse_array(sp_mat)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.core_number(G)
    got = np.asarray(res.k_cores)
    for v in range(60):
        # reference peels from k=1, so isolated (core 0) vertices report 1
        assert got[v] == max(want[v], 1), (v, got[v], want[v])


# ---------------------------------------------------------------- TC
def test_tc_reference_unittest_graph():
    """The literal 4-vertex graph from unittests/algorithms/tc.cuh:20-61:
    expected per-vertex counts {2,1,2,1} and total 6 (= 3 * 2 triangles)."""
    import numpy as np

    from gunrock_tpu.algorithms import tc
    from gunrock_tpu.graph import build_graph_from_arrays
    from gunrock_tpu.graph.properties import GraphProperties

    g = build_graph_from_arrays(
        4,
        np.asarray([0, 3, 5, 8, 10], np.int32),
        np.asarray([1, 2, 3, 0, 2, 0, 1, 3, 0, 2], np.int32),
        properties=GraphProperties(directed=False, symmetric=True),
    )
    res = tc.run(g, warmup=False)
    np.testing.assert_array_equal(
        np.asarray(res.vertex_triangles_count), [2, 1, 2, 1]
    )
    assert res.total_triangles_count == 6
    assert res.n_triangles == 2


def test_tc_matches_networkx():
    import networkx as nx

    from gunrock_tpu.algorithms import tc

    g, sp_mat = random_graph(None, n=64, p=0.15, symmetric=True, seed_offset=16)
    res = tc.run(g, warmup=False)
    G = nx.from_scipy_sparse_array(sp_mat)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = np.asarray(res.vertex_triangles_count)
    for v in range(64):
        assert got[v] == want[v], (v, got[v], want[v])


def test_color_pallas_is_proper():
    """The max-times semiring coloring path also yields a proper coloring."""
    from gunrock_tpu.algorithms import color
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g, sp_mat = random_graph(None, n=70, p=0.1, symmetric=True, seed_offset=14)
    res = color.run(
        g, options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
        warmup=False,
    )
    colors = np.asarray(res.colors)
    assert (colors >= 0).all()
    coo = sp_mat.tocoo()
    off = coo.row != coo.col
    assert (colors[coo.row[off]] != colors[coo.col[off]]).all()


def test_color_rank_is_proper():
    """Rank-based multi-color JP (strategy='rank'): proper coloring in far
    fewer rounds than Luby max+min, on both the XLA and Pallas paths,
    symmetric and directed inputs."""
    import pytest

    from gunrock_tpu.algorithms import color
    from gunrock_tpu.ops.configs import LoadBalance, Options

    for symmetric in (True, False):
        g, sp_mat = random_graph(
            None, n=70, p=0.1, symmetric=symmetric, seed_offset=14
        )
        luby = color.run(g, warmup=False, strategy="luby")
        for lb in (LoadBalance.XLA_SEGMENT, LoadBalance.PALLAS_MERGE_PATH):
            res = color.run(
                g, options=Options(load_balance=lb), warmup=False,
                strategy="rank",
            )
            colors = np.asarray(res.colors)
            assert (colors >= 0).all(), (symmetric, lb)
            coo = sp_mat.tocoo()
            off = coo.row != coo.col
            assert (colors[coo.row[off]] != colors[coo.col[off]]).all(), (
                symmetric, lb,
            )
            if symmetric:
                # the same check the coloring scans rely on: undirected
                assert (colors[coo.col[off]] != colors[coo.row[off]]).all()
            assert res.iterations <= luby.iterations, (
                "rank strategy should never need more rounds than 2-color "
                f"Luby ({res.iterations} vs {luby.iterations})"
            )


def test_color_greedy_is_proper():
    """Speculative windowed-mex greedy (strategy='greedy'): proper
    coloring on both the XLA and Pallas paths, symmetric and directed
    inputs, with XLA/Pallas agreeing exactly (both are deterministic and
    share the update rules), and color count at most Luby's (greedy-mex
    quality should never lose to 2-colors-per-round)."""
    from gunrock_tpu.algorithms import color
    from gunrock_tpu.ops.configs import LoadBalance, Options

    for symmetric in (True, False):
        g, sp_mat = random_graph(
            None, n=70, p=0.1, symmetric=symmetric, seed_offset=14
        )
        luby = color.run(g, warmup=False, strategy="luby")
        got = {}
        for lb in (LoadBalance.XLA_SEGMENT, LoadBalance.PALLAS_MERGE_PATH):
            res = color.run(
                g, options=Options(load_balance=lb), warmup=False,
                strategy="greedy",
            )
            colors = np.asarray(res.colors)
            got[lb] = colors
            assert (colors >= 0).all(), (symmetric, lb)
            coo = sp_mat.tocoo()
            off = coo.row != coo.col
            assert (colors[coo.row[off]] != colors[coo.col[off]]).all(), (
                symmetric, lb,
            )
            n_colors = int(colors.max()) + 1
            n_luby = int(np.asarray(luby.colors).max()) + 1
            assert n_colors <= n_luby, (n_colors, n_luby)
        assert (got[LoadBalance.XLA_SEGMENT]
                == got[LoadBalance.PALLAS_MERGE_PATH]).all()


def test_color_greedy_multi_window():
    """A clique of 40 > K=32 forces phase advances past the first color
    window; the mex windows must hand off without improper colors."""
    import scipy.sparse as sp

    from gunrock_tpu.algorithms.color import color_kernel_greedy
    from gunrock_tpu.formats import Coo, coo_to_csr
    from gunrock_tpu.graph import build_graph
    from gunrock_tpu.graph.properties import GraphProperties

    n = 40
    coo = sp.csr_matrix(np.ones((n, n)) - np.eye(n)).tocoo()
    g = build_graph(
        coo_to_csr(Coo(
            n_rows=n, n_cols=n,
            row_indices=coo.row.astype(np.int32),
            col_indices=coo.col.astype(np.int32),
            values=coo.data.astype(np.float32),
        )),
        GraphProperties(directed=False, weighted=False, symmetric=True),
    )
    colors, it = color_kernel_greedy(g)
    colors = np.asarray(colors)
    # a clique needs exactly n colors, spanning 2 windows of K=32
    assert sorted(colors) == list(range(n)), colors
    assert int(it) >= 2


def test_hits_pallas_matches_xla():
    from gunrock_tpu.algorithms import hits
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g, _ = random_graph(None, n=60, p=0.1, weighted=False, seed_offset=13)
    a = hits.run(g, max_iterations=15, options=Options(), warmup=False)
    b = hits.run(
        g, max_iterations=15,
        options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
        warmup=False,
    )
    np.testing.assert_allclose(np.asarray(a.auth), np.asarray(b.auth), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.hub), np.asarray(b.hub), atol=1e-5)


def test_color_degree_ordering_proper():
    """JP largest-degree-first ordering also yields a proper coloring."""
    from gunrock_tpu.algorithms import color

    g, sp_mat = random_graph(None, n=70, p=0.1, symmetric=True, seed_offset=14)
    res = color.run(g, warmup=False, ordering="degree")
    colors = np.asarray(res.colors)
    assert (colors >= 0).all()
    coo = sp_mat.tocoo()
    off = coo.row != coo.col
    assert (colors[coo.row[off]] != colors[coo.col[off]]).all()


def test_kcore_pallas_path_matches_networkx():
    """k-jump + cond-guarded Pallas decrement path (interpret mode)."""
    import networkx as nx

    from gunrock_tpu.algorithms import kcore
    from gunrock_tpu.ops.configs import LoadBalance, Options

    g, A = random_graph(None, n=120, p=0.08, symmetric=True, seed_offset=90)
    res = kcore.run(
        g, options=Options(load_balance=LoadBalance.PALLAS_MERGE_PATH),
        warmup=False,
    )
    G = nx.from_scipy_sparse_array(A)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.core_number(G)
    got = np.asarray(res.k_cores)
    assert all(got[v] == want[v] for v in G.nodes)
    assert res.degeneracy == max(want.values())
