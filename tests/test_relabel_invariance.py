"""Relabeling-invariance battery: every algorithm must produce the same
answer (up to the vertex permutation) on a degree-sorted relabeling of
the same graph — degree_sort produces an isomorphic graph, so any
divergence is an order-dependence bug in the kernel (this exact check
caught the MST directed-input canonicalization bug: the Borůvka cut test
dropped u>v edges and the forest weight depended on the labeling).

No reference counterpart (the reference has no relabeling pass); this is
the safety net for `--reorder degree` being on the hot path.
"""

import numpy as np
import pytest

from gunrock_tpu.graph.reorder import degree_sort
from gunrock_tpu.io.generators import rmat_graph


@pytest.fixture(scope="module")
def pair():
    g = rmat_graph(scale=9, edge_factor=8, seed=3)
    rg, ro = degree_sort(g)
    return g, rg, ro


def test_bfs_invariant(pair):
    from gunrock_tpu.algorithms import bfs

    g, rg, ro = pair
    src = int(np.argmax(np.diff(np.asarray(g.row_offsets))))
    a = np.asarray(bfs.run(g, src, warmup=False).distances)
    b = np.asarray(bfs.run(rg, int(ro.rank[src]), warmup=False).distances)
    np.testing.assert_array_equal(a, b[ro.rank])


def test_sssp_invariant(pair):
    from gunrock_tpu.algorithms import sssp

    g, rg, ro = pair
    src = int(np.argmax(np.diff(np.asarray(g.row_offsets))))
    a = np.asarray(sssp.run(g, src, warmup=False).distances)
    b = np.asarray(sssp.run(rg, int(ro.rank[src]), warmup=False).distances)
    np.testing.assert_allclose(a, b[ro.rank], rtol=1e-5)


def test_pr_invariant(pair):
    from gunrock_tpu.algorithms import pr

    g, rg, ro = pair
    a = np.asarray(pr.run(g, tol=1e-8, warmup=False).p)
    b = np.asarray(pr.run(rg, tol=1e-8, warmup=False).p)
    np.testing.assert_allclose(a, b[ro.rank], atol=1e-6)


def test_kcore_invariant(pair):
    from gunrock_tpu.algorithms import kcore

    g, rg, ro = pair
    a = np.asarray(kcore.run(g, warmup=False).k_cores)
    b = np.asarray(kcore.run(rg, warmup=False).k_cores)
    np.testing.assert_array_equal(a, b[ro.rank])


def test_tc_invariant(pair):
    from gunrock_tpu.algorithms import tc

    g, rg, ro = pair
    a = tc.run(g, warmup=False)
    b = tc.run(rg, warmup=False)
    assert a.n_triangles == b.n_triangles
    np.testing.assert_array_equal(
        np.asarray(a.vertex_triangles_count),
        np.asarray(b.vertex_triangles_count)[ro.rank],
    )


def test_mst_invariant(pair):
    from gunrock_tpu.algorithms import mst

    g, rg, ro = pair
    a = mst.run(g, warmup=False)
    b = mst.run(rg, warmup=False)
    assert a.n_components == b.n_components
    assert abs(a.mst_weight - b.mst_weight) < 1e-3 * max(1.0, abs(a.mst_weight))


def test_hits_invariant(pair):
    from gunrock_tpu.algorithms import hits

    g, rg, ro = pair
    a = hits.run(g, max_iterations=15, warmup=False)
    b = hits.run(rg, max_iterations=15, warmup=False)
    np.testing.assert_allclose(
        np.asarray(a.auth), np.asarray(b.auth)[ro.rank], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.hub), np.asarray(b.hub)[ro.rank], atol=1e-5
    )


def test_spmv_invariant(pair):
    from gunrock_tpu.algorithms import spmv

    g, rg, ro = pair
    x = np.random.default_rng(0).random(g.n_vertices).astype(np.float32)
    a = np.asarray(spmv.run(g, x, warmup=False).y)
    b = np.asarray(spmv.run(rg, x[ro.order], warmup=False).y)
    np.testing.assert_allclose(a, b[ro.rank], rtol=1e-5)


def test_color_proper_both_orders(pair):
    """Colors are order-dependent by design (priorities); properness is
    the invariant."""
    from gunrock_tpu.algorithms import color
    from gunrock_tpu.graph import hostcache

    g, rg, ro = pair
    for graph in (g, rg):
        for strategy in ("luby", "rank"):
            res = color.run(graph, warmup=False, strategy=strategy)
            cols = np.asarray(res.colors)
            assert (cols >= 0).all()
            offs = hostcache.host(graph, "row_offsets")
            dst = hostcache.host(graph, "col_indices")
            src = np.repeat(
                np.arange(graph.n_vertices, dtype=np.int32), np.diff(offs)
            )
            off_diag = src != dst
            assert (cols[src[off_diag]] != cols[dst[off_diag]]).all(), strategy
