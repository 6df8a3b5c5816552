"""Graph build + accessor tests (role of reference
unittests/graph/graph_load.cuh:10-33 — load a graph and read accessors)."""

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.io import sample


def test_sample_graph_build():
    g = sample.graph()
    assert g.n_vertices == 4
    assert g.n_edges == 4
    np.testing.assert_array_equal(g.row_offsets, [0, 0, 2, 3, 4])
    np.testing.assert_array_equal(g.col_indices, [0, 1, 2, 1])
    np.testing.assert_array_equal(g.edge_src, [1, 1, 2, 3])


def test_csc_view():
    g = sample.graph()
    # Column 0: edge (1,0); column 1: (1,1),(3,1); column 2: (2,2)
    np.testing.assert_array_equal(g.csc_offsets, [0, 1, 3, 4, 4])
    np.testing.assert_array_equal(g.csc_rows, [1, 1, 3, 2])
    np.testing.assert_array_equal(g.csc_dst, [0, 1, 1, 2])
    np.testing.assert_allclose(g.csc_values, [5, 8, 6, 3])
    # csc_edge_perm maps back to CSR edge ids
    np.testing.assert_allclose(np.asarray(g.values)[np.asarray(g.csc_edge_perm)],
                               np.asarray(g.csc_values))


def test_accessors_host_and_jit():
    g = sample.graph()
    assert int(g.get_number_of_neighbors(1)) == 2
    assert int(g.get_starting_edge(2)) == 2
    assert int(g.get_destination_vertex(3)) == 1
    assert int(g.get_source_vertex(3)) == 3
    assert float(g.get_edge_weight(2)) == 3.0

    # Same accessors under jit (reference tests read accessors both from
    # host and from a __global__ kernel).
    @jax.jit
    def probe(g):
        return (
            g.get_number_of_neighbors(jnp.int32(1)),
            g.get_source_vertex(jnp.int32(3)),
            g.get_edge(jnp.int32(1), jnp.int32(1)),
            g.get_edge(jnp.int32(1), jnp.int32(3)),
        )

    nn, src, e_found, e_missing = probe(g)
    assert int(nn) == 2
    assert int(src) == 3
    assert int(e_found) == 1
    assert int(e_missing) == -1


def test_get_edge_vmapped():
    g = sample.small_connected_graph()
    us = jnp.array([0, 0, 1, 4, 6, 3], dtype=jnp.int32)
    vs = jnp.array([1, 2, 3, 3, 0, 0], dtype=jnp.int32)
    eids = jax.vmap(g.get_edge)(us, vs)
    # verify against edge list
    srcs = np.asarray(g.edge_src)
    dsts = np.asarray(g.col_indices)
    for u, v, e in zip(np.asarray(us), np.asarray(vs), np.asarray(eids)):
        expect = np.where((srcs == u) & (dsts == v))[0]
        if expect.size:
            assert e == expect[0]
        else:
            assert e == -1


def test_degrees_and_stats():
    g = sample.graph()
    np.testing.assert_array_equal(g.out_degrees(), [0, 2, 1, 1])
    np.testing.assert_array_equal(g.in_degrees(), [1, 2, 1, 0])
    assert abs(float(g.get_average_degree()) - 1.0) < 1e-6
    hist = np.asarray(g.build_degree_histogram())
    assert hist.sum() == 4


def test_symmetric_graph_aliases_csc(rng):
    from tests.conftest import random_graph

    g, sp_mat = random_graph(rng, n=32, p=0.2, symmetric=True)
    # For a symmetric edge set, in-degrees == out-degrees
    np.testing.assert_array_equal(g.out_degrees(), g.in_degrees())
    # And the CSC view must be a valid transpose: check via scipy
    csc = sp_mat.tocsc()
    csc.sort_indices()
    np.testing.assert_array_equal(np.asarray(g.csc_offsets), csc.indptr)
    np.testing.assert_array_equal(np.asarray(g.csc_rows), csc.indices)


def test_asymmetric_csc_against_scipy(rng):
    from tests.conftest import random_graph

    g, sp_mat = random_graph(rng, n=48, p=0.15, symmetric=False)
    csc = sp_mat.tocsc()
    csc.sort_indices()
    np.testing.assert_array_equal(np.asarray(g.csc_offsets), csc.indptr)
    np.testing.assert_array_equal(np.asarray(g.csc_rows), csc.indices)
    np.testing.assert_allclose(np.asarray(g.csc_values), csc.data, rtol=1e-6)


def test_degree_sort_reorder_roundtrip():
    """graph/reorder.py: relabeled graph preserves the edge multiset and
    BFS results map back exactly through rank[]."""
    import numpy as np

    from gunrock_tpu.algorithms.bfs import bfs_kernel_do
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.graph.reorder import degree_sort
    from gunrock_tpu.io.generators import rmat_graph

    g = rmat_graph(scale=8, edge_factor=8, seed=3)
    rg, ro = degree_sort(g)
    assert rg.n_edges == g.n_edges
    s0 = set(zip(hostcache.host(g, "edge_src").tolist(),
                 hostcache.host(g, "col_indices").tolist()))
    s1 = set(zip(ro.order[hostcache.host(rg, "edge_src")].tolist(),
                 ro.order[hostcache.host(rg, "col_indices")].tolist()))
    assert s0 == s1
    # hubs first: new-id degree sequence is non-increasing
    deg2 = np.diff(hostcache.host(rg, "row_offsets")) + np.bincount(
        hostcache.host(rg, "col_indices"), minlength=rg.n_vertices)
    assert (np.diff(deg2) <= 0).all()
    src = 5
    d0, _ = bfs_kernel_do(g, src)
    d1, _ = bfs_kernel_do(rg, int(ro.rank[src]))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1)[ro.rank])
