"""Triangle counting: per-vertex triangle membership + total.

Role of reference include/gunrock/algorithms/tc.hxx — one advance over all
vertices where each edge (u, v) with ``v > u`` runs a sorted two-pointer
intersection of adjacency lists, incrementing every intersection vertex's
counter (tc.hxx:78-101, csr.hxx:116-173); the total is the sum of the
per-vertex counters — i.e. 3x the number of distinct triangles
(unittests/algorithms/tc.cuh:50-61: counts {2,1,2,1}, total 6 for 2
triangles).

TPU redesign (not a translation): the graph is oriented into a DAG by
degree order (u -> v iff (deg(u), u) < (deg(v), v)), which bounds every
DAG out-degree by O(sqrt(E)) and makes each triangle discoverable exactly
once as a wedge u -> {v, w} with v -> w. Counting is then a fixed-shape
batched *sorted-membership* test: for each DAG edge (u, v), gather N+(u)
padded to the max DAG degree and binary-search each element in N+(v) —
O(log) vectorized lanes instead of the reference's serial two-pointer
walk. Per-vertex membership falls out by scatter-adding each found
triangle to its three corners. Edges stream through a ``lax.scan`` in
fixed chunks to bound memory.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.graph import hostcache

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Param:
    reduce_all_triangles: bool = True


@dataclasses.dataclass
class Result:
    vertex_triangles_count: jax.Array  # int32[V] — triangles containing v
    total_triangles_count: int  # sum of the above == 3 * n_triangles
    n_triangles: int
    elapsed_ms: float


def build_dag(graph: Graph):
    """Degree-ordered DAG orientation (host side, numpy).

    Returns (offsets int32[V+1], adj int32[E_dag], edge_u, edge_v, deg)
    where ``adj`` rows are ascending (inherited from CSR column order),
    (edge_u, edge_v) enumerate DAG edges in CSR order, and ``deg`` is the
    symmetrized simple-graph degree the orientation ranked by (returned
    so callers need not re-symmetrize — a second full scipy maximum(A.T)
    pass costs seconds at scale 20).
    """
    offsets = hostcache.host(graph, "row_offsets")
    cols = hostcache.host(graph, "col_indices")
    src = hostcache.host(graph, "edge_src")
    if not graph.properties.symmetric:
        # Triangles live on the underlying undirected graph: symmetrize
        # and dedupe directed inputs (self-loops dropped by orientation).
        import scipy.sparse as sp

        V = graph.n_vertices
        A = sp.csr_matrix(
            (np.ones(src.shape[0], np.int8), (src, cols)), shape=(V, V)
        )
        A = A.maximum(A.T).tocoo()
        src = A.row.astype(np.int64)
        cols = A.col.astype(np.int64)
        deg = np.zeros(V, np.int64)
        np.add.at(deg, src, 1)
    else:
        deg = np.diff(offsets)
    # rank(u) < rank(v) iff (deg[u], u) < (deg[v], v)
    keep = (deg[src] < deg[cols]) | ((deg[src] == deg[cols]) & (src < cols))
    edge_u = src[keep].astype(np.int32)
    edge_v = cols[keep].astype(np.int32)
    dag_deg = np.zeros(graph.n_vertices, dtype=np.int64)
    np.add.at(dag_deg, edge_u, 1)
    dag_offsets = np.zeros(graph.n_vertices + 1, dtype=np.int32)
    np.cumsum(dag_deg, out=dag_offsets[1:])
    return dag_offsets, edge_v.copy(), edge_u, edge_v, np.asarray(deg, np.int64)


def _search_steps(max_len: int) -> int:
    return max(1, int(np.ceil(np.log2(max(max_len, 2)))) + 1)


def tc_kernel(
    graph_n_vertices: int,
    dag_offsets: jax.Array,
    dag_adj: jax.Array,
    edge_u: jax.Array,
    edge_v: jax.Array,
    max_dag_degree: int,
    chunk: int,
):
    """Batched wedge-check TC over DAG edges. Shapes must be pre-padded:
    ``edge_u/edge_v`` to a multiple of ``chunk`` with -1."""
    V = graph_n_vertices
    D = max(int(max_dag_degree), 1)
    steps = _search_steps(D)
    E_pad = edge_u.shape[0]
    n_chunks = E_pad // chunk
    eu = edge_u.reshape(n_chunks, chunk)
    ev = edge_v.reshape(n_chunks, chunk)

    def chunk_body(counts, ue_ve):
        u, v = ue_ve  # int32[chunk]
        valid_e = u >= 0
        us = jnp.where(valid_e, u, 0)
        vs = jnp.where(valid_e, v, 0)
        # gather N+(u) padded to D
        base = dag_offsets[us]  # [B]
        du = dag_offsets[us + 1] - base
        j = jnp.arange(D, dtype=jnp.int32)[None, :]  # [1, D]
        valid_y = (j < du[:, None]) & valid_e[:, None]
        gather_idx = jnp.where(valid_y, base[:, None] + j, 0)
        y = dag_adj[gather_idx]  # [B, D]
        # lower_bound of y in N+(v)
        lo = jnp.broadcast_to(dag_offsets[vs][:, None], y.shape)
        hi0 = dag_offsets[vs + 1][:, None]
        hi = jnp.broadcast_to(hi0, y.shape)

        def sstep(_, lh):
            lo, hi = lh
            active = lo < hi
            mid = (lo + hi) // 2
            go_right = dag_adj[jnp.minimum(mid, dag_adj.shape[0] - 1)] < y
            new_lo = jnp.where(go_right, mid + 1, lo)
            new_hi = jnp.where(go_right, hi, mid)
            return jnp.where(active, new_lo, lo), jnp.where(active, new_hi, hi)

        lo, hi = jax.lax.fori_loop(0, steps, sstep, (lo, hi))
        found = (
            valid_y
            & (lo < hi0)
            & (dag_adj[jnp.minimum(lo, dag_adj.shape[0] - 1)] == y)
        )
        f32 = found.astype(jnp.int32)
        per_edge = jnp.sum(f32, axis=1)  # triangles closed at edge (u,v)
        # scatter to the three corners (membership counts)
        counts = counts.at[jnp.where(found, y, V)].add(f32, mode="drop")
        counts = counts.at[jnp.where(valid_e, us, V)].add(per_edge, mode="drop")
        counts = counts.at[jnp.where(valid_e, vs, V)].add(per_edge, mode="drop")
        return counts, None

    counts0 = jnp.zeros(V, dtype=jnp.int32)
    counts, _ = jax.lax.scan(chunk_body, counts0, (eu, ev))
    return counts


def build_wedges(dag_offsets, dag_adj, edge_u, edge_v, rank_deg,
                 t0: int = 0, t1: int | None = None):
    """Host wedge enumeration (numpy): every triangle appears exactly
    once as a wedge {x, y} from some u with x, y in N+(u) — emitted
    ORIENTED by the DAG's (degree, id) rank so the pair matches the
    stored direction of its closing edge. Returns (wv, ww, wu) int32.
    ``t0/t1``: optional wedge-index range — the slabbed big-graph
    sort-join builds and joins one slab at a time."""
    dag_deg = np.diff(dag_offsets).astype(np.int64)
    r = np.arange(edge_u.size, dtype=np.int64) - dag_offsets[edge_u]
    cnt = dag_deg[edge_u] - r - 1
    woff = np.zeros(edge_u.size + 1, np.int64)
    np.cumsum(cnt, out=woff[1:])
    total = int(woff[-1])
    if t1 is None:
        t1 = total
    t = np.arange(t0, min(t1, total), dtype=np.int64)
    a_id = np.searchsorted(woff, t, side="right") - 1
    within = t - woff[a_id]
    wu = edge_u[a_id]
    x = edge_v[a_id].astype(np.int64)
    y = dag_adj[dag_offsets[wu] + r[a_id] + 1 + within].astype(np.int64)
    # orient by (deg, id) rank — the build_dag orientation rule
    x_first = (rank_deg[x] < rank_deg[y]) | (
        (rank_deg[x] == rank_deg[y]) & (x < y)
    )
    wv = np.where(x_first, x, y)
    ww = np.where(x_first, y, x)
    return wv.astype(np.int32), ww.astype(np.int32), wu.astype(np.int32)


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("B", "V"))
def build_wedges_device(dag_offsets, dag_adj, edge_u, edge_v, deg,
                        woff, r, w0, B: int, V: int):
    """Device wedge enumeration for one slab [w0, w0+B) — the host
    numpy build (searchsorted over the wedge-offset table) dominated
    big-graph TC (s20: ~50 s/slab of a 1319 s run). Here the per-wedge
    (x, adj_pos, u) streams are piecewise-arithmetic over the wedge
    axis, so spgemm's telescoped expansion (scatter + cumsum) generates
    them in linear vector passes; the only per-wedge gathers left are
    dag_adj[adj_pos] and deg[y] (orientation).

    ``woff`` int64[E+1] global wedge offsets (values may exceed int32 —
    rebased per slab), ``r`` int32[E] within-row rank of each DAG edge.
    Invalid slots (beyond the slab's real wedges) return wv = V, which
    can never join (every edge key has a < V)."""
    from gunrock_tpu.algorithms.spgemm import _piecewise_expand

    E = edge_u.shape[0]
    cnt = (woff[1:] - woff[:-1])
    # off[e] = this slab's start slot of edge e's wedge segment
    # (_piecewise_expand's int32[n_edges] convention, off[0] == 0)
    off = jnp.clip(woff[:-1] - w0, 0, B).astype(jnp.int32)
    skip = jnp.clip(w0 - woff[:-1], 0, cnt).astype(jnp.int32)
    base = dag_offsets[edge_u] + r + 1 + skip
    x_s, adj_pos = _piecewise_expand(edge_v, base, off, B)
    u_s, _ = _piecewise_expand(edge_u, base, off, B)
    n_valid = (jnp.clip(woff[-1] - w0, 0, B)).astype(jnp.int32)
    valid = jnp.arange(B, dtype=jnp.int32) < n_valid
    y_s = dag_adj[jnp.clip(adj_pos, 0, dag_adj.shape[0] - 1)]
    dx = deg[jnp.clip(x_s, 0, V - 1)]
    dy = deg[y_s]
    x_first = (dx < dy) | ((dx == dy) & (x_s < y_s))
    wv = jnp.where(valid, jnp.where(x_first, x_s, y_s), V)
    ww = jnp.where(x_first, y_s, x_s)
    wu = u_s
    return wv, ww, wu


def tc_kernel_sortjoin(V: int, eu, ev, wv, ww, wu):
    """Sort-merge join TC: wedges vs DAG edges as one device sort.

    The membership probes of ``tc_kernel`` are serialized gathers on TPU
    (~0.1 Gelem/s); here the whole join is a single ``lax.sort`` of the
    concatenated (edge, wedge) key streams — a run of equal (a, b) keys
    starts with the (unique) DAG edge iff the wedge closes a triangle.
    No per-probe gathers; one N log N sort + two linear passes.

    The second key packs b WITH the edge/wedge flag in the low bit
    (b*2 + is_wedge < 2^31 for any V <= 2^30): edges still sort first
    within an (a, b) run, and the sort runs with 2 keys + 1 payload
    (apex+1 for wedges) instead of 5 operands — sort time is
    payload-bandwidth- and key-count-bound on TPU.
    Role of reference csr.hxx:116-173 ``get_intersection_count``."""
    E = eu.shape[0]
    a = jnp.concatenate([eu, wv])
    bt = jnp.concatenate([ev * 2, ww * 2 + 1])
    tag = jnp.concatenate([jnp.zeros(E, jnp.int32), wu + 1])
    from gunrock_tpu.ops.sort import lex_sort

    a_s, bt_s, tag_s = lex_sort((a, bt, tag), num_keys=2, two_pass=False)
    b_s = bt_s >> 1
    e_s = jnp.where((bt_s & 1) == 0, 1, 0)
    u_s = tag_s - 1
    is_start = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]),
        ]
    )
    # "run contains an edge" without a serialized gather: edges sort first
    # within a run, so a segmented prefix-max of the edge flag (the
    # classic cummax + 2*segment_id offset trick) answers it in linear
    # vector passes.
    seg_id = jnp.cumsum(is_start.astype(jnp.int32))
    z = e_s + 2 * seg_id
    run_edge = jax.lax.cummax(z) - 2 * seg_id
    match = (run_edge >= 1) & (e_s == 0)
    # Per-corner membership counts WITHOUT scatter-adds (TPU scatters are
    # serialized — measured 3x250 ms at 34M lanes, 75% of the kernel):
    # - v-corner (a_s) is sorted by the join sort: prefix-sum of the
    #   match flags sampled at vertex boundaries (binary search) gives
    #   per-vertex counts in linear vector passes,
    # - u- and w-corners ride ONE single-key sort of their sentinel-masked
    #   ids, counted the same way by boundary differencing.
    m32 = match.astype(jnp.int32)
    pref = jnp.cumsum(m32)  # pref[i] = matches in [0, i]
    vb = jnp.arange(V + 1, dtype=jnp.int32)
    bounds_a = jnp.searchsorted(a_s, vb)  # first index with a_s >= v
    pref0 = jnp.concatenate([jnp.zeros(1, jnp.int32), pref])
    cnt_v = jnp.diff(pref0[bounds_a])
    uw = jnp.concatenate(
        [jnp.where(match, u_s, V), jnp.where(match, b_s, V)]
    )
    (uw_s,) = jax.lax.sort((uw,), num_keys=1)
    cnt_uw = jnp.diff(jnp.searchsorted(uw_s, vb))
    return cnt_v + cnt_uw


def tc_total_sortjoin(eu, ev, wv, ww, wu):
    """Total-only sort-join TC (no per-vertex scatters): sort + two linear
    passes + one reduction — the fastest path when only the triangle
    count is needed. The edge/wedge flag packs into b's low bit, so the
    sort is 2 keys / 2 operands (was 3/3)."""
    del wu
    E = eu.shape[0]
    a = jnp.concatenate([eu, wv])
    bt = jnp.concatenate([ev * 2, ww * 2 + 1])
    from gunrock_tpu.ops.sort import lex_sort

    a_s, bt_s = lex_sort((a, bt), num_keys=2, two_pass=False)
    b_s = bt_s >> 1
    e_s = jnp.where((bt_s & 1) == 0, 1, 0)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    )
    seg_id = jnp.cumsum(is_start.astype(jnp.int32))
    run_edge = jax.lax.cummax(e_s + 2 * seg_id) - 2 * seg_id
    return jnp.sum(((run_edge >= 1) & (e_s == 0)).astype(jnp.int32))


import functools


@functools.lru_cache(maxsize=8)
def _sortjoin_jit(n_vertices: int):
    """One jitted executable per vertex count — repeat run() calls reuse
    it instead of recompiling (a fresh jit closure per call costs ~90 s
    over the axon tunnel)."""
    return jax.jit(functools.partial(tc_kernel_sortjoin, n_vertices))


def run(
    graph: Graph,
    reduce_all_triangles: bool = True,
    options: Options | None = None,
    warmup: bool = True,
    method: str = "sortjoin",
    max_wedges: int = 400_000_000,
) -> Result:
    """Role of reference ``tc::run`` (tc.hxx:143-170).

    ``method='sortjoin'`` (default) runs the device sort-merge join;
    ``'probe'`` keeps the batched binary-search kernel (wedge sets above
    ``max_wedges`` also fall back to it — bounded memory)."""
    del options
    from gunrock_tpu.ops.pallas.layout import cached_layout

    dag_offsets, dag_adj, edge_u, edge_v, udeg = cached_layout(
        graph.col_indices, lambda: build_dag(graph), ("tc_dag",)
    )
    if method == "sortjoin":
        deg = np.diff(dag_offsets).astype(np.int64)
        n_wedges = int((deg * (deg - 1) // 2).sum())
        if n_wedges > max_wedges:
            # big-graph path: SLAB the join. One sort of edges+ALL
            # wedges exceeds both HBM and the device/RPC deadline at
            # s20+ (UNAVAILABLE); per-corner counts are additive across
            # wedge slabs, so each slab joins against the full edge set
            # independently. Wedges are enumerated ON DEVICE per slab
            # (build_wedges_device — the host numpy build dominated the
            # first measurement: 1319 s at s20, ~50 s/slab of
            # searchsorted).
            V = graph.n_vertices
            fn = _sortjoin_jit(V)
            dag_deg_np = np.diff(dag_offsets).astype(np.int64)
            r_np = (np.arange(edge_u.size, dtype=np.int64)
                    - dag_offsets[edge_u]).astype(np.int32)
            woff_np = np.zeros(edge_u.size + 1, np.int64)
            np.cumsum(dag_deg_np[edge_u]
                      - r_np.astype(np.int64) - 1, out=woff_np[1:])
            eu_d = jnp.asarray(edge_u)
            ev_d = jnp.asarray(edge_v)
            offs_d = jnp.asarray(dag_offsets.astype(np.int32))
            adj_d = jnp.asarray(dag_adj)
            deg_d = jnp.asarray(np.minimum(udeg, 2**31 - 1).astype(np.int32))
            woff_d = jnp.asarray(woff_np)
            r_d = jnp.asarray(r_np)
            t0 = time.perf_counter()
            counts = None
            for w0 in range(0, n_wedges, max_wedges):
                wv, ww, wu = build_wedges_device(
                    offs_d, adj_d, eu_d, ev_d, deg_d, woff_d, r_d,
                    jnp.int64(w0), B=max_wedges, V=V,
                )
                part = fn(eu_d, ev_d, wv, ww, wu)
                counts = part if counts is None else counts + part
            counts = jax.block_until_ready(counts)
            elapsed_ms = (time.perf_counter() - t0) * 1e3
            total = int(jnp.sum(counts)) if reduce_all_triangles else 0
            return Result(
                vertex_triangles_count=counts,
                total_triangles_count=total,
                n_triangles=total // 3,
                elapsed_ms=elapsed_ms,
            )
        if 0 < n_wedges <= max_wedges:
            args = cached_layout(
                graph.col_indices,
                lambda: tuple(
                    jnp.asarray(x)
                    for x in (edge_u, edge_v)
                    + build_wedges(
                        dag_offsets, dag_adj, edge_u, edge_v, udeg
                    )
                ),
                ("tc_wedges",),
            )
            fn = _sortjoin_jit(graph.n_vertices)
            if warmup:
                jax.block_until_ready(fn(*args))
            t0 = time.perf_counter()
            counts = jax.block_until_ready(fn(*args))
            elapsed_ms = (time.perf_counter() - t0) * 1e3
            total = int(jnp.sum(counts)) if reduce_all_triangles else 0
            return Result(
                vertex_triangles_count=counts,
                total_triangles_count=total,
                n_triangles=total // 3,
                elapsed_ms=elapsed_ms,
            )
    D = int(np.diff(dag_offsets).max()) if dag_adj.size else 1
    # bound chunk memory to ~2^22 lanes
    chunk = int(max(128, min((1 << 22) // max(D, 1), 1 << 15)))
    E_dag = edge_u.shape[0]
    E_pad = -(-max(E_dag, 1) // chunk) * chunk
    # slab the probe sweep into bounded dispatches: one scan over ALL
    # chunks at s20+ exceeds the device/RPC deadline (UNAVAILABLE — the
    # same failure class as the fused SpGEMM sweep and geo's old
    # single-dispatch loop). ~2^28 probe-gather elements per dispatch
    # keeps each call to a couple of seconds at the ~0.1 Gelem/s
    # serialized-gather floor.
    slab_chunks = max(1, (1 << 28) // (chunk * max(D, 1)))
    slab = chunk * slab_chunks
    E_slab = -(-max(E_dag, 1) // slab) * slab
    pad = np.full(E_slab - E_dag, -1, dtype=np.int32)
    eu = jnp.asarray(np.concatenate([edge_u, pad]))
    ev = jnp.asarray(np.concatenate([edge_v, pad]))
    offs = jnp.asarray(dag_offsets)
    adj = jnp.asarray(dag_adj if dag_adj.size else np.zeros(1, np.int32))

    from gunrock_tpu.utils.jitcache import cached_jit

    fn = cached_jit(
        ("tc_membership", graph.n_vertices, D, chunk, slab),
        lambda: lambda o, a, u, v: tc_kernel(
            graph.n_vertices, o, a, u, v, D, chunk
        ),
    )
    n_slabs = E_slab // slab

    def sweep():
        counts = None
        for s in range(n_slabs):
            part = fn(
                offs, adj,
                jax.lax.dynamic_slice_in_dim(eu, s * slab, slab),
                jax.lax.dynamic_slice_in_dim(ev, s * slab, slab),
            )
            counts = part if counts is None else counts + part
        return jax.block_until_ready(counts)

    if warmup:
        sweep()
    t0 = time.perf_counter()
    counts = sweep()
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    total = int(jnp.sum(counts)) if reduce_all_triangles else 0
    return Result(
        vertex_triangles_count=counts,
        total_triangles_count=total,
        n_triangles=total // 3,
        elapsed_ms=elapsed_ms,
    )
