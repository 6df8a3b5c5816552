"""Vertex-sharded distributed algorithms vs single-chip oracles on the
8-virtual-device CPU mesh (both boundary-exchange modes)."""

import numpy as np
import pytest

from tests.conftest import random_graph

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    from gunrock_tpu.parallel.mesh import make_mesh

    return make_mesh(N_DEV)


@pytest.fixture(scope="module", params=["allgather", "halo"])
def setup(request, mesh):
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, A = random_graph(None, n=100, p=0.06, weighted=True, seed_offset=40)
    sg = partition_sharded(g, N_DEV, mesh, use_halo=request.param == "halo")
    return g, A, sg


def test_partition_memory_scales(setup):
    """Per-device vertex state is V/n, not V — the round-2 memory fix."""
    g, A, sg = setup
    assert sg.v_per_shard == -(-g.n_vertices // N_DEV)
    assert sg.ed_per_shard * N_DEV >= g.n_edges


def test_sharded_bfs(setup, mesh):
    from gunrock_tpu.algorithms import bfs as sbfs
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    dist, depth = sharded.bfs(sg, 0, mesh)
    want = np.asarray(sbfs.run(g, 0, warmup=False).distances)
    got = np.asarray(dist)
    got = np.where(got == np.iinfo(np.int32).max, -1, got)
    want = np.where(want == np.iinfo(np.int32).max, -1, want)
    np.testing.assert_array_equal(got, want)


def test_sharded_sssp(setup, mesh):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    dist, _ = sharded.sssp(sg, 0, mesh)
    want = csg.dijkstra(A, indices=0)
    np.testing.assert_allclose(np.asarray(dist), want, rtol=1e-5, atol=1e-5)


def test_sharded_pagerank(setup, mesh):
    from gunrock_tpu.algorithms import pr as spr
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    p, it = sharded.pagerank(sg, mesh, tol=1e-8)
    want = np.asarray(spr.run(g, tol=1e-8, warmup=False).p)
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-4, atol=1e-7)


def test_sharded_spmv(setup, mesh):
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    x = np.random.default_rng(3).random(g.n_vertices).astype(np.float32)
    y = sharded.spmv(sg, x, mesh)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-4, atol=1e-5)


def test_sharded_hits(setup, mesh):
    from gunrock_tpu.algorithms import hits as shits
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    auth, hub, it = sharded.hits(sg, mesh, max_iterations=20)
    ref = shits.run(g, max_iterations=20, warmup=False)
    np.testing.assert_allclose(np.asarray(auth), np.asarray(ref.auth), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hub), np.asarray(ref.hub), rtol=1e-4, atol=1e-6)


def test_sharded_ppr(setup, mesh):
    from gunrock_tpu.algorithms import ppr as sppr
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    p, it = sharded.ppr(sg, 5, mesh, epsilon=1e-5)
    ref = sppr.run(g, 5, epsilon=1e-5, warmup=False)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref.p), rtol=1e-5, atol=1e-8)


@pytest.fixture(scope="module", params=["allgather", "halo"])
def sym_setup(request, mesh):
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, A = random_graph(None, n=96, p=0.07, weighted=True, symmetric=True,
                        seed_offset=41)
    sg = partition_sharded(g, N_DEV, mesh, use_halo=request.param == "halo")
    return g, A, sg


def test_sharded_kcore(sym_setup, mesh):
    import networkx as nx

    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    cores, degen = sharded.kcore(sg, mesh)
    G = nx.from_scipy_sparse_array(A)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.core_number(G)
    got = np.asarray(cores)
    assert all(got[v] == want[v] for v in G.nodes)
    assert degen == max(want.values())


def test_sharded_kcore_self_loops(mesh):
    """Self loops are excluded from peel degrees in the sharded kernel
    too (must match the single-chip kernel on non-simple inputs)."""
    from tests.test_fuzz import _odd_graph

    from gunrock_tpu.algorithms.kcore import kcore_kernel
    from gunrock_tpu.parallel import sharded
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, _ = _odd_graph(104)  # contains self loops + isolated vertices
    sg = partition_sharded(g, N_DEV, mesh, use_halo=False)
    cores, degen = sharded.kcore(sg, mesh)
    want, want_degen, _ = kcore_kernel(g)
    assert (np.asarray(cores) == np.asarray(want)).all()
    assert degen == int(want_degen)


def test_sharded_color(sym_setup, mesh):
    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    colors, rounds = sharded.color(sg, mesh, seed=1)
    c = np.asarray(colors)
    src = np.asarray(g.edge_src)
    dst = np.asarray(g.col_indices)
    off_diag = src != dst
    assert (c >= 0).all()
    assert (c[src[off_diag]] != c[dst[off_diag]]).all()


def test_sharded_color_greedy(sym_setup, mesh):
    """Distributed spec-greedy coloring: proper, and bit-identical to the
    single-chip XLA greedy kernel (both deterministic over the same
    global-id priorities and update rules)."""
    from gunrock_tpu.algorithms.color import color_kernel_greedy
    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    colors, rounds = sharded.color_greedy(sg, mesh)
    c = np.asarray(colors)
    src = np.asarray(g.edge_src)
    dst = np.asarray(g.col_indices)
    off_diag = src != dst
    assert (c >= 0).all()
    assert (c[src[off_diag]] != c[dst[off_diag]]).all()
    want, it_single = color_kernel_greedy(g)
    assert (c == np.asarray(want)).all()


def test_sharded_color_greedy_directed(mesh):
    """Directed input: properness holds on the underlying undirected
    graph (both-side edge scans), matching the single-chip kernel."""
    from gunrock_tpu.algorithms.color import color_kernel_greedy
    from gunrock_tpu.parallel import sharded
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, A = random_graph(None, n=96, p=0.07, weighted=True, symmetric=False,
                        seed_offset=43)
    want, _ = color_kernel_greedy(g)
    for use_halo in (False, True):
        sg = partition_sharded(g, N_DEV, mesh, use_halo=use_halo)
        colors, rounds = sharded.color_greedy(sg, mesh)
        c = np.asarray(colors)
        src = np.asarray(g.edge_src)
        dst = np.asarray(g.col_indices)
        off_diag = src != dst
        assert (c >= 0).all(), use_halo
        assert (c[src[off_diag]] != c[dst[off_diag]]).all(), use_halo
        assert (c == np.asarray(want)).all(), use_halo


def test_sharded_bc(sym_setup, mesh):
    from gunrock_tpu.algorithms import bc as sbc
    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    got = np.asarray(sharded.bc(sg, 3, mesh))
    want = np.asarray(sbc.run(g, 3, warmup=False).bc_values)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_mst(sym_setup, mesh):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    total, rounds = sharded.mst(sg, mesh)
    want = csg.minimum_spanning_tree(A).sum()
    np.testing.assert_allclose(total, want, rtol=1e-5)


def test_sharded_geo(sym_setup, mesh):
    from gunrock_tpu.algorithms import geo as sgeo
    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    V = g.n_vertices
    rng = np.random.default_rng(11)
    lat = np.where(rng.random(V) < 0.4, rng.uniform(-60, 60, V), np.nan).astype(np.float32)
    lon = np.where(np.isnan(lat), np.nan, rng.uniform(-170, 170, V)).astype(np.float32)
    glat, glon = sharded.geo(sg, lat, lon, mesh, total_iterations=2,
                             spatial_iterations=50)
    ref = sgeo.run(g, lat, lon, total_iterations=2, spatial_iterations=50,
                   warmup=False)
    np.testing.assert_allclose(
        np.asarray(glat), np.asarray(ref.latitude), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(glon), np.asarray(ref.longitude), rtol=1e-3, atol=1e-3
    )


def test_sharded_spgemm_count(setup, mesh):
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    nnz, csum = sharded.spgemm_count(sg, g, mesh)
    want = A @ A
    assert nnz == want.nnz
    np.testing.assert_allclose(csum, want.sum(), rtol=1e-4)


def test_collective_bytes_report(setup):
    from gunrock_tpu.parallel.sharded import collective_bytes_per_exchange

    g, A, sg = setup
    b = collective_bytes_per_exchange(sg)
    assert b > 0


def test_tc_ring_matches_networkx(sym_setup, mesh):
    """Ring-rotation sharded-DAG TC: per-device residency 2E/n, adjacency
    circulated via ppermute — must equal networkx and the replicated
    variant."""
    import networkx as nx

    from gunrock_tpu.parallel import algorithms as dalg
    from gunrock_tpu.parallel import sharded

    g, A, sg = sym_setup
    counts, total = sharded.tc_ring(g, mesh)
    G = nx.from_scipy_sparse_array(A)
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.triangles(G)
    got = np.asarray(counts)
    assert all(got[v] == want[v] for v in G.nodes)
    c2, t2 = dalg.tc_replicated(g, mesh)
    np.testing.assert_array_equal(got, np.asarray(c2))


def test_sharded_row_splits_match_segments(setup, mesh):
    """The per-shard row splits must delimit exactly the sorted
    (owner-local) edge segments — the cumsum-difference sum reduction in
    _local_reduce depends on it."""
    g, A, sg = setup
    n, Vs = sg.n_shards, sg.v_per_shard
    for prefix, per in (("d", sg.ed_per_shard), ("s", sg.es_per_shard)):
        key = np.asarray(getattr(sg, f"{prefix}_{'dst' if prefix == 'd' else 'src'}_local")).reshape(n, per)
        valid = np.asarray(getattr(sg, f"{prefix}_valid")).reshape(n, per)
        splits = np.asarray(getattr(sg, f"{prefix}_row_splits")).reshape(n, Vs + 1)
        for d in range(n):
            want = np.concatenate(
                [[0], np.cumsum(np.bincount(key[d][valid[d]], minlength=Vs))]
            )
            np.testing.assert_array_equal(splits[d], want)


def test_sharded_pallas_layouts_parity(setup, mesh):
    """The bucketed-Pallas sharded path (round 4: per-shard layouts
    dispatched under shard_map) must match the XLA segment path on every
    converted algorithm, both exchange modes."""
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    n = sg.n_shards
    Ld = sharded.build_sharded_layouts(g, n, side="d", window=256, chunk=256)
    Li = sharded.build_sharded_layouts(
        g, n, side="d", window=256, chunk=256, pad_value=float("inf")
    )
    Ls = sharded.build_sharded_layouts(g, n, side="s", window=256, chunk=256)

    d0, dep0 = sharded.bfs(sg, 1, mesh)
    d1, dep1 = sharded.bfs(sg, 1, mesh, layouts=Ld)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    assert dep0 == dep1

    s0, _ = sharded.sssp(sg, 1, mesh)
    s1, _ = sharded.sssp(sg, 1, mesh, layouts=Li)
    f0 = np.isfinite(np.asarray(s0))
    np.testing.assert_array_equal(f0, np.isfinite(np.asarray(s1)))
    np.testing.assert_allclose(
        np.asarray(s0)[f0], np.asarray(s1)[f0], rtol=1e-6, atol=1e-6
    )

    p0, _ = sharded.pagerank(sg, mesh, tol=1e-8)
    p1, _ = sharded.pagerank(sg, mesh, tol=1e-8, layouts=Ld)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)

    x = np.random.default_rng(0).random(g.n_vertices).astype(np.float32)
    y0 = sharded.spmv(sg, x, mesh)
    y1 = sharded.spmv(sg, x, mesh, layouts=Ls)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


def test_sharded_hits_pallas_layouts(setup, mesh):
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup
    n = sg.n_shards
    Ls = sharded.build_sharded_layouts(g, n, side="s", window=256,
                                       chunk=256, unit=True)
    Ld = sharded.build_sharded_layouts(g, n, side="d", window=256,
                                       chunk=256, unit=True)
    a0, h0, i0 = sharded.hits(sg, mesh, max_iterations=20)
    a1, h1, i1 = sharded.hits(sg, mesh, max_iterations=20,
                              layouts=(Ls, Ld))
    assert i0 == i1
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# hierarchical (host, chip) mesh — SURVEY §2.8 two-level partition


@pytest.fixture(scope="module")
def mesh2d():
    from gunrock_tpu.parallel.mesh import make_mesh_2d

    return make_mesh_2d(2, 4)


@pytest.fixture(scope="module", params=["allgather", "halo"])
def setup2d(request, mesh2d):
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, A = random_graph(None, n=100, p=0.06, weighted=True, seed_offset=40)
    sg = partition_sharded(g, N_DEV, mesh2d,
                           use_halo=request.param == "halo")
    return g, A, sg


def test_2d_mesh_bfs_sssp_parity(setup2d, mesh2d):
    import scipy.sparse.csgraph as csg

    from gunrock_tpu.algorithms import bfs as sbfs
    from gunrock_tpu.parallel import sharded

    g, A, sg = setup2d
    dist, _ = sharded.bfs(sg, 0, mesh2d)
    want = np.asarray(sbfs.run(g, 0, warmup=False).distances)
    np.testing.assert_array_equal(np.asarray(dist), want)
    d2, _ = sharded.sssp(sg, 0, mesh2d)
    np.testing.assert_allclose(
        np.asarray(d2), csg.dijkstra(A, indices=0), rtol=1e-5, atol=1e-5
    )


def test_2d_mesh_pagerank_kcore_parity(setup2d, mesh2d):
    from gunrock_tpu.algorithms import kcore as skc
    from gunrock_tpu.algorithms import pr as spr
    from gunrock_tpu.parallel import sharded
    from gunrock_tpu.parallel.sharded import partition_sharded

    g, A, sg = setup2d
    p, _ = sharded.pagerank(sg, mesh2d)
    want = np.asarray(spr.run(g, warmup=False).p)
    np.testing.assert_allclose(np.asarray(p), want, rtol=2e-4, atol=1e-6)
    # kcore needs symmetric storage (in-degree peel)
    gs, _ = random_graph(None, n=96, p=0.07, weighted=True,
                         symmetric=True, seed_offset=41)
    sgs = partition_sharded(gs, N_DEV, mesh2d, use_halo=sg.use_halo)
    cores, k = sharded.kcore(sgs, mesh2d)
    ref = skc.run(gs, warmup=False)
    np.testing.assert_array_equal(np.asarray(cores),
                                  np.asarray(ref.k_cores))
    assert int(k) == ref.degeneracy


def test_2d_mesh_hierarchical_a2a_matches_flat(mesh2d, mesh):
    """The 2-stage (DCN-aggregated) halo exchange must be a drop-in for
    the flat all_to_all: same recv ordering for host-major shard ids."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gunrock_tpu.parallel import sharded

    rng = np.random.default_rng(3)
    H = 5
    data = jnp.asarray(rng.random((N_DEV * N_DEV, H)).astype(np.float32))

    def flat(x):
        return jax.lax.all_to_all(x, "edges", split_axis=0, concat_axis=0)

    def hier(x):
        return sharded._a2a_shards(x, ("host", "chip"))

    r1 = jax.jit(sharded._shard_map(
        flat, mesh, in_specs=P("edges"), out_specs=P("edges")))(data)
    r2 = jax.jit(sharded._shard_map(
        hier, mesh2d, in_specs=P(("host", "chip")),
        out_specs=P(("host", "chip"))))(data)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_collective_bytes_detail():
    from gunrock_tpu.parallel.sharded import (
        collective_bytes_detail, partition_sharded)

    g, _ = random_graph(None, n=120, p=0.05, seed_offset=41)
    sg = partition_sharded(g, N_DEV, None, use_halo=True)
    d = collective_bytes_detail(sg, n_hosts=2)
    assert d["total"] == d["dcn"] + d["ici"]
    assert d["dcn"] > 0 and d["dcn_messages_per_device"] == 1
    d1 = collective_bytes_detail(sg, n_hosts=1)
    assert d1["dcn"] == 0 and d1["total"] == d["total"]
