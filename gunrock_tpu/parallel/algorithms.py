"""Distributed graph algorithms: SPMD ``lax.while_loop`` per device.

Each algorithm is the single-chip kernel (gunrock_tpu.algorithms.*) with
its segmented reductions swapped for the shard-reduce + ICI-collective
primitives — the whole convergence loop still compiles to ONE XLA program
per device. This is the distribution model the reference lacks entirely
(SURVEY.md section 2.8: operators throw on multi-GPU contexts).

Usage::

    mesh = make_mesh()                      # all chips
    pg = partition_graph(g, mesh.size, mesh)
    dist, depth = algorithms.bfs(pg, src=0, mesh=mesh)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gunrock_tpu.parallel.partition import PartitionedGraph

UNREACHED = jnp.iinfo(jnp.int32).max


def _shard_map(fn, mesh, in_specs, out_specs):
    if hasattr(jax, "shard_map"):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _seg(reduce):
    return {
        "min": jax.ops.segment_min,
        "max": jax.ops.segment_max,
        "sum": jax.ops.segment_sum,
    }[reduce]


def bfs(pg: PartitionedGraph, src: int, mesh, max_iterations: int | None = None):
    """Distributed BFS. Returns (distances int32[V], depth) replicated."""
    V = pg.n_vertices
    axis = mesh.axis_names[0]
    max_it = V if max_iterations is None else max_iterations

    def spmd(pg):
        dist0 = jnp.full(V, UNREACHED, dtype=jnp.int32).at[src].set(0)
        front0 = jnp.zeros(V, dtype=bool).at[src].set(True)

        def cond(c):
            it, f, d = c
            return jnp.any(f) & (it < max_it)

        def body(c):
            it, f, d = c
            active = f[pg.csc_rows] & pg.csc_valid
            local = jax.ops.segment_max(
                active.astype(jnp.int32),
                pg.csc_dst,
                num_segments=V,
                indices_are_sorted=True,
            )
            reached = jax.lax.pmax(local, axis) > 0
            new = reached & (d == UNREACHED)
            d = jnp.where(new, it + 1, d)
            return it + 1, new, d

        it, _, d = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
        return d, it

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P())))
    return fn(pg)


def sssp(pg: PartitionedGraph, src: int, mesh, max_iterations: int | None = None):
    """Distributed frontier Bellman-Ford. Returns (distances f32[V], depth)."""
    V = pg.n_vertices
    axis = mesh.axis_names[0]
    max_it = V if max_iterations is None else max_iterations

    def spmd(pg):
        dist0 = jnp.full(V, jnp.inf, dtype=jnp.float32).at[src].set(0.0)
        front0 = jnp.zeros(V, dtype=bool).at[src].set(True)

        def cond(c):
            it, f, d = c
            return jnp.any(f) & (it < max_it)

        def body(c):
            it, f, d = c
            active = f[pg.csc_rows] & pg.csc_valid
            cand = jnp.where(active, d[pg.csc_rows] + pg.csc_values, jnp.inf)
            local = jax.ops.segment_min(
                cand, pg.csc_dst, num_segments=V, indices_are_sorted=True
            )
            relaxed = jax.lax.pmin(local, axis)
            improved = relaxed < d
            d = jnp.where(improved, relaxed, d)
            return it + 1, improved, d

        it, _, d = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
        return d, it

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P())))
    return fn(pg)


def pagerank(
    pg: PartitionedGraph,
    mesh,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 10_000,
):
    """Distributed weighted PageRank (reference pr.hxx semantics).

    Returns (p f32[V], iterations), replicated.
    """
    V = pg.n_vertices
    axis = mesh.axis_names[0]

    def spmd(pg):
        # iweights = alpha / out_weight_sum (0 for dangling): by-src reduce.
        wsum_local = jax.ops.segment_sum(
            jnp.where(pg.edge_valid, pg.edge_values, 0.0),
            pg.edge_src,
            num_segments=V,
            indices_are_sorted=True,
        )
        out_wsum = jax.lax.psum(wsum_local, axis)
        iweights = jnp.where(out_wsum != 0.0, alpha / out_wsum, 0.0)
        p0 = jnp.full(V, 1.0 / V, dtype=jnp.float32)

        def cond(c):
            it, p, err = c
            return (err >= tol) & (it < max_iterations)

        def body(c):
            it, p, _ = c
            plast = p
            dsum = jnp.sum(jnp.where(iweights == 0.0, alpha * plast, 0.0))
            base = (1.0 - alpha + dsum) / V
            contrib = jnp.where(
                pg.csc_valid,
                plast[pg.csc_rows] * iweights[pg.csc_rows] * pg.csc_values,
                0.0,
            )
            local = jax.ops.segment_sum(
                contrib, pg.csc_dst, num_segments=V, indices_are_sorted=True
            )
            p = base + jax.lax.psum(local, axis)
            return it + 1, p, jnp.max(jnp.abs(p - plast))

        it, p, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf))
        )
        return p, it

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P())))
    return fn(pg)


def spmv(pg: PartitionedGraph, x: jax.Array, mesh):
    """Distributed y = A.x over the edge partition. Returns y f32[V]."""
    V = pg.n_vertices
    axis = mesh.axis_names[0]

    def spmd(pg, x):
        vals = jnp.where(pg.edge_valid, pg.edge_values * x[pg.edge_dst], 0.0)
        local = jax.ops.segment_sum(
            vals, pg.edge_src, num_segments=V, indices_are_sorted=True
        )
        return jax.lax.psum(local, axis)

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis), P()), out_specs=P()))
    return fn(pg, x)
