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


def kcore(pg: PartitionedGraph, mesh):
    """Distributed k-core decomposition (flat peel loop; vertex state
    replicated, degree decrements combined with psum). Returns
    (k_cores int32[V], degeneracy)."""
    V = pg.n_vertices
    axis = mesh.axis_names[0]

    def spmd(pg):
        deg_local = jax.ops.segment_sum(
            pg.edge_valid.astype(jnp.int32),
            pg.edge_src,
            num_segments=V,
            indices_are_sorted=True,
        )
        deg = jax.lax.psum(deg_local, axis)

        def cond(c):
            k, deg, deleted, cores = c
            return ~jnp.all(deleted)

        def body(c):
            k, deg, deleted, cores = c
            peel = (~deleted) & (deg <= k)
            any_peel = jnp.any(peel)
            cores = jnp.where(peel, k, cores)
            deleted = deleted | peel
            dec_local = jax.ops.segment_sum(
                (peel[pg.csc_rows] & pg.csc_valid).astype(jnp.int32),
                pg.csc_dst,
                num_segments=V,
                indices_are_sorted=True,
            )
            deg = deg - jax.lax.psum(dec_local, axis)
            k = jnp.where(any_peel, k, k + 1)
            return k, deg, deleted, cores

        k, _, _, cores = jax.lax.while_loop(
            cond,
            body,
            (jnp.int32(1), deg, jnp.zeros(V, bool), jnp.zeros(V, jnp.int32)),
        )
        return cores, k

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P())))
    return fn(pg)


def hits(pg: PartitionedGraph, mesh, max_iterations: int = 50):
    """Distributed HITS (reference hits.hxx semantics). Returns
    (auth f32[V], hub f32[V], iterations)."""
    V = pg.n_vertices
    axis = mesh.axis_names[0]

    def spmd(pg):
        auth0 = jnp.ones(V, jnp.float32)
        hub0 = jnp.ones(V, jnp.float32)

        def l2(x):
            s = jnp.sum(x * x)
            return jnp.where(s > 0, x / jnp.sqrt(s), x)

        def cond(c):
            it, auth, hub, done = c
            return (~done) & (it < max_iterations)

        def body(c):
            it, auth, hub, _ = c
            hub_local = jax.ops.segment_sum(
                jnp.where(pg.edge_valid, auth[pg.edge_dst], 0.0),
                pg.edge_src,
                num_segments=V,
                indices_are_sorted=True,
            )
            hub_n = l2(jax.lax.psum(hub_local, axis))
            auth_local = jax.ops.segment_sum(
                jnp.where(pg.csc_valid, hub[pg.csc_rows], 0.0),
                pg.csc_dst,
                num_segments=V,
                indices_are_sorted=True,
            )
            auth_n = l2(jax.lax.psum(auth_local, axis))
            done = jnp.all(auth_n == auth) | jnp.all(hub_n == hub)
            return it + 1, auth_n, hub_n, done

        it, auth, hub, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), auth0, hub0, jnp.bool_(False))
        )
        return auth, hub, it

    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P(), P()))
    )
    return fn(pg)


def tc(graph, mesh):
    """Distributed triangle counting: the degree-ordered DAG's edges are
    sharded across the mesh, each device runs the batched sorted-
    membership count on its chunk, and per-vertex counts combine with one
    psum. The DAG adjacency is replicated (compute scales with devices;
    memory does not yet — an edge-partitioned adjacency exchange is the
    next step). Returns (vertex counts int32[V], total)."""
    import numpy as np

    from gunrock_tpu.algorithms.tc import _search_steps, build_dag

    V = graph.n_vertices
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    dag_offsets, dag_adj, edge_u, edge_v = build_dag(graph)
    D = int(np.diff(dag_offsets).max()) if dag_adj.size else 1
    steps = _search_steps(D)
    E_dag = edge_u.shape[0]
    per_dev = -(-max(E_dag, 1) // n_dev)
    E_pad = per_dev * n_dev
    pad = np.full(E_pad - E_dag, -1, dtype=np.int32)
    eu = jnp.asarray(np.concatenate([edge_u, pad]))
    ev = jnp.asarray(np.concatenate([edge_v, pad]))
    offs = jnp.asarray(dag_offsets)
    adj = jnp.asarray(dag_adj if dag_adj.size else np.zeros(1, np.int32))

    def spmd(offs, adj, eu, ev):
        valid_e = eu >= 0
        us = jnp.where(valid_e, eu, 0)
        vs = jnp.where(valid_e, ev, 0)
        base = offs[us]
        du = offs[us + 1] - base
        j = jnp.arange(D, dtype=jnp.int32)[None, :]
        valid_y = (j < du[:, None]) & valid_e[:, None]
        y = adj[jnp.where(valid_y, base[:, None] + j, 0)]
        lo = jnp.broadcast_to(offs[vs][:, None], y.shape)
        hi0 = offs[vs + 1][:, None]
        hi = jnp.broadcast_to(hi0, y.shape)

        def sstep(_, lh):
            lo, hi = lh
            active = lo < hi
            mid = (lo + hi) // 2
            go_right = adj[jnp.minimum(mid, adj.shape[0] - 1)] < y
            nlo = jnp.where(go_right, mid + 1, lo)
            nhi = jnp.where(go_right, hi, mid)
            return jnp.where(active, nlo, lo), jnp.where(active, nhi, hi)

        lo, hi = jax.lax.fori_loop(0, steps, sstep, (lo, hi))
        found = valid_y & (lo < hi0) & (
            adj[jnp.minimum(lo, adj.shape[0] - 1)] == y
        )
        f32 = found.astype(jnp.int32)
        per_edge = jnp.sum(f32, axis=1)
        counts = jnp.zeros(V, jnp.int32)
        counts = counts.at[jnp.where(found, y, V)].add(f32, mode="drop")
        counts = counts.at[jnp.where(valid_e, us, V)].add(per_edge, mode="drop")
        counts = counts.at[jnp.where(valid_e, vs, V)].add(per_edge, mode="drop")
        return jax.lax.psum(counts, axis)

    fn = jax.jit(
        _shard_map(
            spmd, mesh, in_specs=(P(), P(), P(axis), P(axis)), out_specs=P()
        )
    )
    counts = fn(offs, adj, eu, ev)
    return counts, int(jnp.sum(counts))
