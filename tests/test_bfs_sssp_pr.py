"""Algorithm correctness vs networkx/scipy oracles (the reference's
--validate CPU-reference pattern, examples/algorithms/bfs/bfs_cpu.hxx)."""

import os

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from gunrock_tpu.algorithms import bfs, pr, sssp
from gunrock_tpu.io import sample

REFERENCE_CHESAPEAKE = "/root/reference/datasets/chesapeake/chesapeake.mtx"


def _nx_digraph(g):
    srcs = np.asarray(g.edge_src)
    dsts = np.asarray(g.col_indices)
    ws = np.asarray(g.values)
    G = nx.DiGraph()
    G.add_nodes_from(range(g.n_vertices))
    for s, d, w in zip(srcs, dsts, ws):
        # networkx keeps the *last* parallel edge; keep min weight instead
        if G.has_edge(int(s), int(d)):
            w = min(w, G[int(s)][int(d)]["weight"])
        G.add_edge(int(s), int(d), weight=float(w))
    return G


def check_bfs(g, src):
    res = bfs.run(g, src, warmup=False)
    G = _nx_digraph(g)
    oracle = nx.single_source_shortest_path_length(G, src)
    dist = np.asarray(res.distances)
    for v in range(g.n_vertices):
        if v in oracle:
            assert dist[v] == oracle[v], f"vertex {v}"
        else:
            assert dist[v] == bfs.UNREACHED, f"vertex {v}"
    # predecessors consistent: dist[pred[v]] + 1 == dist[v]
    preds = np.asarray(res.predecessors)
    for v in range(g.n_vertices):
        if v != src and v in oracle:
            assert preds[v] >= 0
            assert dist[preds[v]] + 1 == dist[v]


def check_sssp(g, src):
    res = sssp.run(g, src, warmup=False)
    G = _nx_digraph(g)
    oracle = nx.single_source_dijkstra_path_length(G, src)
    dist = np.asarray(res.distances)
    for v in range(g.n_vertices):
        if v in oracle:
            np.testing.assert_allclose(dist[v], oracle[v], rtol=1e-5)
        else:
            assert np.isinf(dist[v])
    preds = np.asarray(res.predecessors)
    for v in range(g.n_vertices):
        if v != src and v in oracle and oracle[v] > 0:
            assert preds[v] >= 0


def test_bfs_small():
    check_bfs(sample.small_connected_graph(), 0)


def test_bfs_disconnected():
    check_bfs(sample.graph(), 1)  # vertex 0 has no out-edges; 3 unreachable


def test_bfs_random(rng):
    from tests.conftest import random_graph

    g, _ = random_graph(rng, n=80, p=0.05)
    check_bfs(g, 3)


def test_bfs_kernel_vmap():
    g = sample.small_connected_graph()
    sources = jnp.array([0, 1, 2], dtype=jnp.int32)
    dists, preds, depths = jax.vmap(lambda s: bfs.bfs_kernel(g, s))(sources)
    for i, s in enumerate([0, 1, 2]):
        single = bfs.run(g, s, warmup=False)
        np.testing.assert_array_equal(np.asarray(dists[i]), np.asarray(single.distances))


def test_sssp_small():
    check_sssp(sample.small_connected_graph(), 0)


def test_sssp_random(rng):
    from tests.conftest import random_graph

    g, _ = random_graph(rng, n=80, p=0.05)
    check_sssp(g, 3)


def test_pr_matches_networkx(rng):
    from tests.conftest import random_graph

    g, sp_mat = random_graph(rng, n=60, p=0.1, weighted=True)
    res = pr.run(g, alpha=0.85, tol=1e-8, warmup=False)
    G = _nx_digraph(g)
    oracle = nx.pagerank(G, alpha=0.85, tol=1e-10, max_iter=500, weight="weight")
    ours = np.asarray(res.p)
    want = np.array([oracle[v] for v in range(g.n_vertices)])
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_pr_sums_to_one(rng):
    from tests.conftest import random_graph

    g, _ = random_graph(rng, n=60, p=0.08)
    res = pr.run(g, tol=1e-8, warmup=False)
    np.testing.assert_allclose(float(jnp.sum(res.p)), 1.0, atol=1e-4)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CHESAPEAKE), reason="reference dataset not mounted"
)
def test_bfs_chesapeake():
    """The BASELINE smoke config: BFS on chesapeake --src 0."""
    from gunrock_tpu.io import load_graph_file

    g, props = load_graph_file(REFERENCE_CHESAPEAKE)
    assert props.symmetric
    check_bfs(g, 0)
    res = bfs.run(g, 0, warmup=False)
    assert res.search_depth <= 5  # chesapeake is tiny and dense


def test_bfs_direction_optimized_matches_dense():
    """The push/pull switching kernel (reference's declared
    advance_direction_t::optimized) must agree with the dense kernel."""
    import numpy as np

    from gunrock_tpu.algorithms.bfs import bfs_kernel, bfs_kernel_do
    from tests.conftest import random_graph

    for i, (n, p) in enumerate([(97, 0.05), (200, 0.02)]):
        g, _ = random_graph(None, n=n, p=p, seed_offset=140 + i)
        d1, _, it1 = bfs_kernel(g, 0, compute_predecessors=False)
        d2, it2 = bfs_kernel_do(g, 0, edge_budget=64)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert int(it1) == int(it2)


def test_bfs_run_optimized_option():
    import numpy as np

    from gunrock_tpu.algorithms import bfs
    from gunrock_tpu.ops.configs import AdvanceDirection, Options
    from tests.conftest import random_graph

    g, _ = random_graph(None, n=80, p=0.06, seed_offset=150)
    plain = bfs.run(g, 0, warmup=False)
    opt = bfs.run(
        g, 0,
        options=Options(advance_direction=AdvanceDirection.OPTIMIZED),
        warmup=False,
    )
    np.testing.assert_array_equal(
        np.asarray(plain.distances), np.asarray(opt.distances)
    )
    # predecessors must be *valid* (a vertex at depth d has a pred at d-1)
    d = np.asarray(opt.distances)
    p = np.asarray(opt.predecessors)
    reached = d != np.iinfo(np.int32).max
    for v in np.nonzero(reached)[0]:
        if d[v] > 0:
            assert p[v] >= 0 and d[p[v]] == d[v] - 1


def test_msbfs_matches_single_source():
    """Multi-source SpMM BFS agrees with per-source BFS."""
    import jax.numpy as jnp
    import numpy as np

    from gunrock_tpu.algorithms.bfs import bfs_kernel, msbfs_kernel
    from tests.conftest import random_graph

    g, _ = random_graph(None, n=120, p=0.04, seed_offset=160)
    sources = jnp.asarray([0, 5, 17, 44], jnp.int32)
    dist, depth = msbfs_kernel(g, sources)
    for k, s in enumerate([0, 5, 17, 44]):
        want, _, _ = bfs_kernel(g, s, compute_predecessors=False)
        np.testing.assert_array_equal(np.asarray(dist[:, k]), np.asarray(want))


def test_sssp_delta_stepping_matches_dense():
    """Bucketed (delta-stepping) SSSP — the reference's stubbed
    'bucketing' strategy — must produce exact distances."""
    import numpy as np

    from gunrock_tpu.algorithms import sssp
    from gunrock_tpu.algorithms.sssp import sssp_kernel, sssp_kernel_delta
    from gunrock_tpu.ops.configs import LoadBalance, Options
    from tests.conftest import random_graph

    g, _ = random_graph(None, n=150, p=0.04, weighted=True, seed_offset=180)
    d1, _ = sssp_kernel(g, 2)
    d2, _ = sssp_kernel_delta(g, 2, edge_budget=128)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=1e-5, equal_nan=True
    )
    res = sssp.run(
        g, 2, options=Options(load_balance=LoadBalance.BUCKETING), warmup=False
    )
    np.testing.assert_allclose(
        np.asarray(res.distances), np.asarray(d1), rtol=1e-5, equal_nan=True
    )


def test_pr_batch_multi_damping_spmm():
    """K-damping PageRank sweep on the SpMM K axis must match per-alpha
    single runs (interpret mode)."""
    import jax.numpy as jnp

    from gunrock_tpu.algorithms import pr
    from tests.conftest import random_graph

    g, A = random_graph(None, n=150, p=0.06, weighted=True, seed_offset=55)
    alphas = [0.7, 0.85, 0.9]
    P, it = pr.pr_batch_kernel_spmm(g, jnp.asarray(alphas), tol=1e-8,
                                    interpret=True)
    P = np.asarray(P)
    for k, a in enumerate(alphas):
        want = np.asarray(pr.run(g, alpha=a, tol=1e-8, warmup=False).p)
        np.testing.assert_allclose(P[:, k], want, rtol=5e-3, atol=1e-6)


def test_pr_run_batch_public_api():
    """run_batch (the productized multi-damping sweep, reference batch
    operator role batch.hxx:61-84): XLA path matches per-alpha single
    runs tightly; BatchResult carries the column order."""
    from gunrock_tpu.algorithms import pr
    from tests.conftest import random_graph

    g, A = random_graph(None, n=150, p=0.06, weighted=True, seed_offset=55)
    alphas = [0.7, 0.85, 0.9]
    batch = pr.run_batch(g, alphas, tol=1e-8, warmup=False)
    assert batch.alphas == tuple(alphas)
    P = np.asarray(batch.p)
    assert P.shape == (g.n_vertices, 3)
    for k, a in enumerate(alphas):
        want = np.asarray(pr.run(g, alpha=a, tol=1e-8, warmup=False).p)
        # columns share one convergence test (max over K), so fast
        # columns run extra iterations — rounding-order differences only
        np.testing.assert_allclose(P[:, k], want, rtol=1e-4, atol=1e-8)


def test_pr_cli_alphas(capsys):
    """--alphas CLI sweep validates every column against the CPU oracle."""
    from gunrock_tpu.examples import pr as pr_cli

    pr_cli.main(["--market", "/root/repo/datasets/chesapeake.mtx",
                 "--alphas", "0.8,0.85", "--validate"])
    out = capsys.readouterr().out
    assert "FAILED" not in out
    assert "rank[alpha=0.8]" in out


def test_sssp_do_slabbed_matches_dense():
    """The round-slabbed resumable DO driver (big-diameter escape hatch
    for the single-dispatch RPC deadline) must give identical distances
    to the one-shot kernel across slab boundaries."""
    from gunrock_tpu.algorithms.sssp import sssp_do_slabbed, sssp_kernel

    g = sample.small_connected_graph()
    want, _ = sssp_kernel(g, 0)
    for rounds in (1, 2, 7):
        got, depth = sssp_do_slabbed(g, 0, rounds_per_dispatch=rounds)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
