"""Operator-layer tests against literal graphs and scipy oracles
(the style of reference unittests/framework/operators/)."""

import jax.numpy as jnp
import numpy as np

from gunrock_tpu.framework.frontier import QueueFrontier, mask_to_queue, queue_to_mask
from gunrock_tpu.io import sample
from gunrock_tpu.ops import (
    AdvanceDirection,
    advance,
    filter_queue,
    neighbor_reduce,
    uniquify,
)
from gunrock_tpu.ops.configs import UniquifyAlgorithm
from gunrock_tpu.ops.filter import filter_mask


def test_advance_forward_min():
    g = sample.small_connected_graph()
    # frontier = {0}; forward advance with dist+w relaxation
    mask = jnp.zeros(7, dtype=bool).at[0].set(True)
    dist = jnp.full(7, jnp.inf).at[0].set(0.0)

    def relax(src, dst, e, w):
        return dist[src] + w

    reduced, touched = advance(g, mask, relax, reduce="min")
    # 0 -> 1 (2.0), 0 -> 2 (4.0)
    np.testing.assert_allclose(np.asarray(reduced)[[1, 2]], [2.0, 4.0])
    assert bool(touched[1]) and bool(touched[2])
    assert not bool(touched[3])


def test_advance_backward_pull():
    g = sample.small_connected_graph()
    # frontier at destinations {3}; pull reduces by source over out-edges
    mask = jnp.zeros(7, dtype=bool).at[3].set(True)

    def ones(src, dst, e, w):
        return jnp.ones_like(w)

    reduced, touched = advance(
        g, mask, ones, reduce="sum", direction=AdvanceDirection.BACKWARD
    )
    # edges into 3: (1,3) and (4,3) -> sources 1 and 4 each see one edge
    np.testing.assert_allclose(np.asarray(reduced)[[1, 4]], [1.0, 1.0])
    assert bool(touched[1]) and bool(touched[4])


def test_advance_sum_matches_spmv(rng):
    from tests.conftest import random_graph

    g, sp_mat = random_graph(rng, n=40, p=0.2)
    x = np.random.default_rng(7).random(40).astype(np.float32)
    xj = jnp.asarray(x)
    mask = jnp.ones(40, dtype=bool)

    def axpy(src, dst, e, w):
        return w * xj[src]

    y, _ = advance(g, mask, axpy, reduce="sum")
    oracle = sp_mat.T @ x  # reduce-by-dst == A^T x
    np.testing.assert_allclose(np.asarray(y), oracle, rtol=1e-4)


def test_neighbor_reduce_matches_spmv(rng):
    from tests.conftest import random_graph

    g, sp_mat = random_graph(rng, n=40, p=0.2)
    x = np.random.default_rng(8).random(40).astype(np.float32)
    xj = jnp.asarray(x)

    y = neighbor_reduce(g, lambda s, d, e, w: w * xj[d], reduce="sum")
    np.testing.assert_allclose(np.asarray(y), sp_mat @ x, rtol=1e-4)


def test_filter_mask():
    mask = jnp.array([True, True, False, True])
    pred = jnp.array([True, False, True, True])
    np.testing.assert_array_equal(filter_mask(mask, pred), [True, False, False, True])


def test_filter_queue_compact():
    q = QueueFrontier.from_list([4, 2, 9, 7, 2], capacity=8)
    data, count = filter_queue(q.data, q.count, lambda x: x % 2 == 0, compact=True)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(data)[:3], [4, 2, 2])
    np.testing.assert_array_equal(np.asarray(data)[3:], [-1] * 5)


def test_filter_queue_bypass():
    q = QueueFrontier.from_list([4, 2, 9], capacity=4)
    data, count = filter_queue(q.data, q.count, lambda x: x > 3, compact=False)
    assert int(count) == 3  # bypass: count unchanged, failures marked invalid
    np.testing.assert_array_equal(np.asarray(data), [4, -1, 9, -1])


def test_uniquify_scatter():
    q = QueueFrontier.from_list([5, 3, 5, 1, 3, 5], capacity=8)
    data, count = uniquify(q.data, q.count, n_vertices=10)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(data)[:3], [5, 3, 1])  # first-occurrence order


def test_uniquify_sort():
    q = QueueFrontier.from_list([5, 3, 5, 1, 3, 5], capacity=8)
    data, count = uniquify(
        q.data, q.count, n_vertices=10, algorithm=UniquifyAlgorithm.UNIQUE
    )
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(data)[:3], [1, 3, 5])


def test_mask_queue_roundtrip():
    mask = jnp.array([False, True, True, False, True, False])
    data, count = mask_to_queue(mask, capacity=6)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(data)[:3], [1, 2, 4])
    back = queue_to_mask(data, count, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(mask))


def test_queue_frontier_ops():
    q = QueueFrontier.with_capacity(6)
    assert bool(q.is_empty())
    q = q.push_back(3).push_back(1).push_back(5)
    assert int(q.get_number_of_elements()) == 3
    assert int(q.get_element_at(1)) == 1
    q2 = q.sort()
    np.testing.assert_array_equal(np.asarray(q2.data)[:3], [1, 3, 5])
    q3 = q.sequence(10, 4)
    np.testing.assert_array_equal(np.asarray(q3.data), [10, 11, 12, 13, -1, -1])
