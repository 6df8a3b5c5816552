"""Vertex-sharded SPMD graph algorithms: memory that scales with devices.

The second-generation distribution scheme (supersedes the replicated-state
``parallel/algorithms.py`` bodies; role of the reference's *unbuilt*
multi-GPU path — its operators throw on ``context.size() != 1``,
reference advance.hxx:129-132 — and of the striped virtual memory design,
virtual_memory.hxx:120-206, made semantic):

- Vertex state (distances, ranks, colors, frontiers) is **sharded**: each
  device owns the contiguous id range ``[d*Vs, (d+1)*Vs)`` and holds only
  ``[Vs] = V/n`` entries. Per-device memory drops ~1/n.
- Edges are stored twice, grouped by the *owner of the reduction key*:
  ``d_*`` arrays grouped by owner(dst) sorted by (dst, src) — forward
  advances reduce locally with a sorted segment reduction and NO V-sized
  collective; ``s_*`` arrays grouped by owner(src) — by-source
  reductions likewise local.
- The only cross-device traffic is the **boundary exchange** of the x
  operand (frontier values at edge far-ends): either one
  ``all_gather`` of the [Vs] shard (dense graphs) or a host-routed
  ``all_to_all`` halo exchange (sparse cuts — road networks), chosen per
  graph from the measured halo fraction. Plus O(1) scalar collectives
  for convergence. This is the SURVEY §2.8 "all_to_all for boundary
  frontier exchange / psum for convergence" design.

All routing tables are host-precomputed from the static graph, so every
per-iteration exchange is a fixed-shape XLA collective riding ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gunrock_tpu.graph import Graph
from gunrock_tpu.graph.properties import GraphProperties

UNREACHED = jnp.iinfo(jnp.int32).max



def mesh_axes(mesh):
    """The vertex-shard axis spec for this mesh: a single name for the
    flat 1-D layout, or the ORDERED tuple of names for a hierarchical
    (host, chip) mesh — shard ids run host-major, so `axis_index(axes)`,
    `all_gather(..., axes, tiled=True)` and the hierarchical halo
    exchange all agree on shard numbering. Collectives accept the tuple
    directly (psum/pmax/pmin/axis_index), and the DCN-aware paths branch
    on it (SURVEY §2.8 two-level partition)."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def _a2a_shards(send, axis):
    """all_to_all of per-destination-shard blocks ``send[n, ...]``.

    1-D mesh: one ICI all_to_all. Hierarchical mesh (tuple axis): the
    OUTER (DCN/host) axis exchanges per-host AGGREGATED payloads first —
    one big message per host pair instead of one per (chip, chip) pair —
    then the inner (ICI/chip) axis reroutes within each host. Net
    result identical to the flat exchange (probed on the virtual 2x4
    mesh); DCN sees n_hosts aggregated transfers."""
    if not isinstance(axis, tuple):
        return jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    if len(axis) != 2:
        raise NotImplementedError("meshes deeper than (host, chip)")
    outer, inner = axis
    nh = jax.lax.psum(1, outer)  # constant-folded axis size
    nc = jax.lax.psum(1, inner)
    s4 = send.reshape((nh, nc) + send.shape[1:])
    a = jax.lax.all_to_all(s4, outer, split_axis=0, concat_axis=0)
    a = jnp.swapaxes(a, 0, 1)
    b = jax.lax.all_to_all(a, inner, split_axis=0, concat_axis=0)
    return jnp.swapaxes(b, 0, 1).reshape(send.shape)


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call outputs inside the SPMD body carry no
    # varying-mesh-axes annotation (jax 0.9 requires it under the default
    # check) — the per-shard Pallas advances are locally-shaped by
    # construction
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "d_src", "d_dst_local", "d_val", "d_valid", "d_src_pos",
        "s_dst", "s_src_local", "s_val", "s_valid", "s_dst_pos",
        "d_send_idx", "d_send_valid", "s_send_idx", "s_send_valid",
        "d_row_splits", "s_row_splits",
    ],
    meta_fields=[
        "n_vertices", "n_shards", "v_per_shard", "ed_per_shard",
        "es_per_shard", "d_halo", "s_halo", "use_halo", "properties",
    ],
)
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Edge + vertex sharded graph pytree (all data arrays sharded on
    axis 0 over the mesh's edge axis)."""

    # dst-owner-grouped edges (sorted by (dst, src) within each shard)
    d_src: jax.Array  # int32[n*Ed] global source ids
    d_dst_local: jax.Array  # int32[n*Ed] dst - owner_base
    d_val: jax.Array  # f32[n*Ed]
    d_valid: jax.Array  # bool[n*Ed]
    d_src_pos: jax.Array  # int32[n*Ed] index into the halo recv buffer
    # src-owner-grouped edges (sorted by (src, dst) within each shard)
    s_dst: jax.Array  # int32[n*Es] global destination ids
    s_src_local: jax.Array  # int32[n*Es]
    s_val: jax.Array  # f32[n*Es]
    s_valid: jax.Array  # bool[n*Es]
    s_dst_pos: jax.Array  # int32[n*Es]
    # halo send tables: per device, [n, H] local vertex ids to each peer
    d_send_idx: jax.Array  # int32[n * n*Hd]
    d_send_valid: jax.Array  # bool[n * n*Hd]
    s_send_idx: jax.Array  # int32[n * n*Hs]
    s_send_valid: jax.Array  # bool[n * n*Hs]
    # per-shard CSR row splits over the grouped edges (real edges are
    # packed at the front of each shard's slot range) — lets sum
    # reductions run as cumsum-difference instead of a serialized scatter
    d_row_splits: jax.Array  # int32[n * (Vs+1)]
    s_row_splits: jax.Array  # int32[n * (Vs+1)]

    n_vertices: int
    n_shards: int
    v_per_shard: int
    ed_per_shard: int
    es_per_shard: int
    d_halo: int  # H for the dst-grouped (gather-at-src) exchange
    s_halo: int  # H for the src-grouped (gather-at-dst) exchange
    use_halo: bool
    properties: GraphProperties


def _group_edges(key: np.ndarray, other: np.ndarray, val: np.ndarray,
                 n: int, Vs: int):
    """Group edges by owner(key), sorted by (key, other) within a shard.
    Returns (per-shard-padded key_local, other, val, valid, per_shard)."""
    owner = key // Vs
    order = np.lexsort((other, key, owner))
    key, other, val, owner = key[order], other[order], val[order], owner[order]
    counts = np.bincount(owner, minlength=n)
    per = int(counts.max()) if counts.size else 1
    per = max(per, 1)
    E_pad = per * n
    k_out = np.zeros(E_pad, np.int32)
    o_out = np.zeros(E_pad, np.int32)
    v_out = np.zeros(E_pad, np.float32)
    valid = np.zeros(E_pad, bool)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(key.size, dtype=np.int64) - starts[owner]
    dest = owner.astype(np.int64) * per + rank
    k_out[dest] = (key - owner * Vs).astype(np.int32)
    o_out[dest] = other.astype(np.int32)
    v_out[dest] = val
    valid[dest] = True
    return k_out, o_out, v_out, valid, per


def _halo_tables(other_global: np.ndarray, valid: np.ndarray, n: int,
                 Vs: int, per: int):
    """Host routing for the boundary exchange: device d's edges read
    x[other]; owner(other)=e must send those values. Returns
    (send_idx [n, n, H], send_valid, pos [n*per] recv index per edge, H)."""
    lists = {}
    H = 1
    for d in range(n):
        sl = slice(d * per, (d + 1) * per)
        oth = other_global[sl][valid[sl]]
        uniq = np.unique(oth)
        own = uniq // Vs
        for e in range(n):
            l = uniq[own == e]
            lists[(e, d)] = l
            H = max(H, l.size)
    send_idx = np.zeros((n, n, H), np.int32)
    send_valid = np.zeros((n, n, H), bool)
    for (e, d), l in lists.items():
        send_idx[e, d, : l.size] = (l - e * Vs).astype(np.int32)
        send_valid[e, d, : l.size] = True
    pos = np.zeros(n * per, np.int32)
    for d in range(n):
        sl = slice(d * per, (d + 1) * per)
        oth = other_global[sl]
        p = np.zeros(per, np.int64)
        for e in range(n):
            l = lists[(e, d)]
            m = (oth // Vs == e) & valid[sl]
            if l.size:
                p[m] = e * H + np.searchsorted(l, oth[m])
        pos[sl] = p.astype(np.int32)
    return send_idx, send_valid, pos, H


def partition_sharded(
    graph: Graph, n_shards: int, mesh=None, axis_name: str = "edges",
    use_halo: bool | None = None,
) -> ShardedGraph:
    """Build the vertex-sharded partition (host-side). ``use_halo=None``
    picks the exchange mode from the measured halo fraction: the
    all_to_all halo wins when the max per-pair boundary H is below the
    shard width Vs (sparse cuts); otherwise one all_gather is cheaper."""
    V = graph.n_vertices
    Vs = -(-max(V, 1) // n_shards)
    src = np.asarray(graph.edge_src).astype(np.int64)
    dst = np.asarray(graph.col_indices).astype(np.int64)
    val = np.asarray(graph.values).astype(np.float32)

    d_dst_l, d_src, d_val, d_valid, Ed = _group_edges(dst, src, val, n_shards, Vs)
    s_src_l, s_dst, s_val, s_valid, Es = _group_edges(src, dst, val, n_shards, Vs)

    d_send, d_sendv, d_pos, Hd = _halo_tables(d_src, d_valid, n_shards, Vs, Ed)
    s_send, s_sendv, s_pos, Hs = _halo_tables(s_dst, s_valid, n_shards, Vs, Es)

    def row_splits(key_local, valid, per):
        out = np.zeros((n_shards, Vs + 1), np.int32)
        for d in range(n_shards):
            sl = slice(d * per, (d + 1) * per)
            cnt = np.bincount(key_local[sl][valid[sl]], minlength=Vs)
            np.cumsum(cnt, out=out[d, 1:])
        return out.reshape(-1)

    d_splits = row_splits(d_dst_l, d_valid, Ed)
    s_splits = row_splits(s_src_l, s_valid, Es)

    if use_halo is None:
        use_halo = max(Hd, Hs) < Vs

    sg = ShardedGraph(
        d_src=d_src, d_dst_local=d_dst_l, d_val=d_val, d_valid=d_valid,
        d_src_pos=d_pos,
        s_dst=s_dst, s_src_local=s_src_l, s_val=s_val, s_valid=s_valid,
        s_dst_pos=s_pos,
        d_send_idx=d_send.reshape(n_shards, -1).reshape(-1),
        d_send_valid=d_sendv.reshape(n_shards, -1).reshape(-1),
        s_send_idx=s_send.reshape(n_shards, -1).reshape(-1),
        s_send_valid=s_sendv.reshape(n_shards, -1).reshape(-1),
        d_row_splits=d_splits,
        s_row_splits=s_splits,
        n_vertices=V,
        n_shards=n_shards,
        v_per_shard=Vs,
        ed_per_shard=Ed,
        es_per_shard=Es,
        d_halo=Hd,
        s_halo=Hs,
        use_halo=bool(use_halo),
        properties=graph.properties,
    )

    def dev(x):
        arr = jnp.asarray(x)
        if mesh is not None:
            from jax.sharding import NamedSharding

            spec = mesh_axes(mesh) if axis_name == "edges" else axis_name
            arr = jax.device_put(arr, NamedSharding(mesh, P(spec)))
        return arr

    return jax.tree_util.tree_map(dev, sg)


def collective_bytes_per_exchange(sg: ShardedGraph) -> int:
    """ICI bytes moved by one boundary exchange (f32 operand), for the
    scaling report."""
    n = sg.n_shards
    if sg.use_halo:
        return 4 * n * max(sg.d_halo, sg.s_halo)
    return 4 * n * sg.v_per_shard


def collective_bytes_detail(sg: ShardedGraph, n_hosts: int = 1) -> dict:
    """Per-exchange byte accounting split by interconnect tier for the
    hierarchical (host, chip) mesh (scaling.py --model): on the 2-stage
    halo exchange the DCN (host) stage moves each shard's cross-host
    blocks once as per-host aggregates, the ICI (chip) stage reroutes
    everything within hosts; the all_gather form gathers shard-wide
    vectors over ICI first, hosts exchange chip-aggregated blocks."""
    n = sg.n_shards
    chips = max(1, n // max(n_hosts, 1))
    if sg.use_halo:
        H = max(sg.d_halo, sg.s_halo)
        total = 4 * n * H
        # blocks destined to other hosts (per device): (n - chips) * H
        dcn = 4 * (n - chips) * H if n_hosts > 1 else 0
        return {"total": total, "dcn": dcn, "ici": total - dcn,
                "dcn_messages_per_device": max(n_hosts - 1, 0)}
    total = 4 * n * sg.v_per_shard
    dcn = (
        4 * (n_hosts - 1) * chips * sg.v_per_shard if n_hosts > 1 else 0
    )
    return {"total": total, "dcn": dcn, "ici": total - dcn,
            "dcn_messages_per_device": max(n_hosts - 1, 0)}


# ---------------------------------------------------------------------------
# in-SPMD helpers (call inside shard_map; local views of the pytree)


def _gather(sg_local, x_local, axis, side: str):
    """Boundary exchange: per-edge values of x at the non-owned endpoint.

    ``side='d'`` serves the dst-grouped edges (x read at src);
    ``side='s'`` serves the src-grouped edges (x read at dst)."""
    n = sg_local.n_shards
    if side == "d":
        pos, send_idx, send_valid, eidx = (
            sg_local.d_src_pos, sg_local.d_send_idx,
            sg_local.d_send_valid, sg_local.d_src,
        )
        H = sg_local.d_halo
    else:
        pos, send_idx, send_valid, eidx = (
            sg_local.s_dst_pos, sg_local.s_send_idx,
            sg_local.s_send_valid, sg_local.s_dst,
        )
        H = sg_local.s_halo
    if sg_local.use_halo:
        send = jnp.where(
            send_valid.reshape(n, H),
            x_local[send_idx.reshape(n, H)],
            jnp.zeros((), x_local.dtype),
        )
        recv = _a2a_shards(send, axis)
        return recv.reshape(-1)[pos]
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)
    return x_full[eidx]


def _vvalid(sg_local, axis):
    """Local mask of real (non-phantom-padding) vertices."""
    d = jax.lax.axis_index(axis)
    ids = d * sg_local.v_per_shard + jnp.arange(
        sg_local.v_per_shard, dtype=jnp.int32
    )
    return ids < sg_local.n_vertices, ids


def _seg(reduce: str):
    return {
        "min": jax.ops.segment_min,
        "max": jax.ops.segment_max,
        "sum": jax.ops.segment_sum,
    }[reduce]


def _local_reduce(sg_local, edge_vals, active, reduce, side="d",
                  exact=False):
    """Sorted segmented reduction of per-edge values into the local
    vertex shard — NO collective (the reduction key is owner-local).
    ``exact=True`` forces within-segment scatter-add for sums whose
    operands span a huge dynamic range (BC sigma ~2^depth, geo dinv
    ~1e30): the cumsum-difference form's shard-wide prefix
    catastrophically cancels small segments there."""
    from gunrock_tpu.utils.limits import reduce_identity

    seg = sg_local.d_dst_local if side == "d" else sg_local.s_src_local
    ident = reduce_identity(edge_vals.dtype, reduce)
    masked = jnp.where(active, edge_vals, ident)
    if reduce in ("sum", "add") and not exact:
        # cumsum-difference over the precomputed per-shard row splits
        # (CLAUDE.md convention: segment_* scatters serialize on TPU,
        # cumsum streams; min/max have no prefix form and stay scatters)
        splits = (
            sg_local.d_row_splits if side == "d" else sg_local.s_row_splits
        )
        if masked.dtype == jnp.bool_:
            masked = masked.astype(jnp.int32)
        ce = jnp.concatenate(
            [jnp.zeros((1,), masked.dtype), jnp.cumsum(masked)]
        )
        return ce[splits[1:]] - ce[splits[:-1]]
    return _seg(reduce)(
        masked, seg, num_segments=sg_local.v_per_shard, indices_are_sorted=True
    )


def _trim(arr, V):
    """Global padded [n*Vs] result -> [V]."""
    return arr[:V]


# ---------------------------------------------------------------------------
# Pallas bucketed layouts under shard_map (round 4, VERDICT next-step #3:
# the sharded layer previously reduced with XLA segment ops only, so none
# of the single-chip kernel wins transferred to the distributed path)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row_local", "col_local", "values", "chunk_rb",
                 "chunk_cb", "rb_occupied", "src_bits", "dst_bits"],
    meta_fields=["window", "chunk", "n_chunks", "n_row_blocks",
                 "n_col_blocks", "n_vertices", "n_shards", "v_per_shard",
                 "interpret"],
)
@dataclasses.dataclass(frozen=True)
class ShardedLayouts:
    """Per-shard :class:`BucketedEdges` arrays stacked on axis 0
    ([n_shards, ...]) with a COMMON padded chunk count, so every shard
    traces the identical Pallas program under shard_map (SPMD requires
    uniform shapes). Rows stay GLOBAL vertex ids: each shard's layout
    covers the full [V] output space but holds only its own edges —
    blocks outside the shard's range are simply unoccupied, and the
    caller slices its own [Vs] rows after the advance. Padding chunks
    point at the LAST row block with identity values (appended after the
    (rb, cb) sort, so they extend the final accumulation run instead of
    re-flushing an earlier block)."""

    row_local: jax.Array  # int32[n, n_chunks * chunk]
    col_local: jax.Array  # int32[n, n_chunks * chunk]
    values: jax.Array  # f32[n, n_chunks * chunk]
    chunk_rb: jax.Array  # int32[n, n_chunks]
    chunk_cb: jax.Array  # int32[n, n_chunks]
    rb_occupied: jax.Array  # bool[n, n_row_blocks]
    src_bits: jax.Array  # uint32[n, n_chunks] (sub-block occupancy)
    dst_bits: jax.Array  # uint32[n, n_chunks]
    window: int
    chunk: int
    n_chunks: int
    n_row_blocks: int
    n_col_blocks: int
    n_vertices: int
    n_shards: int
    v_per_shard: int
    interpret: bool


def build_sharded_layouts(
    graph: Graph, n_shards: int, side: str = "d",
    window: int | None = None, chunk: int | None = None,
    pad_value: float = 0.0, interpret: bool | None = None,
    unit: bool = False,
) -> ShardedLayouts:
    """Host-side: one bucketed layout per shard over that shard's
    owner-grouped edges (``side='d'``: rows=dst, cols=src — the pull
    orientation bfs/pr/sssp use; ``side='s'``: rows=src, cols=dst — the
    push orientation of spmv), padded to the max chunk count and
    stacked. ``pad_value``: the semiring's edge identity (inf for
    min_plus)."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import (auto_window_chunk,
                                               build_bucketed_layout)

    V = graph.n_vertices
    Vs = -(-max(V, 1) // n_shards)
    if interpret is None:
        interpret = use_interpret()
    if window is None or chunk is None:
        w_auto, c_auto = auto_window_chunk(V, interpret)
        window = window or w_auto
        chunk = chunk or c_auto
    src = np.asarray(graph.edge_src, np.int64)
    dst = np.asarray(graph.col_indices, np.int64)
    val = (np.ones(graph.n_edges, np.float32) if unit
           else np.asarray(graph.values, np.float32))
    rows, cols = (dst, src) if side == "d" else (src, dst)
    owner = rows // Vs

    shards = []
    for d in range(n_shards):
        m = owner == d
        shards.append(build_bucketed_layout(
            rows[m], cols[m], val[m], V,
            window=window, chunk=chunk, pad_value=pad_value,
        ))
    nc = max(1, max(l.n_chunks for l in shards))
    n_rb = shards[0].n_row_blocks

    def pad_stack(field, fill, per_chunk, dtype):
        outs = []
        for l in shards:
            a = np.asarray(getattr(l, field))
            want = nc * (1 if per_chunk else chunk)
            padded = np.full(want, fill, dtype)
            padded[: a.size] = a
            outs.append(padded)
        return jnp.asarray(np.stack(outs))

    return ShardedLayouts(
        row_local=pad_stack("row_local", 0, False, np.int32),
        col_local=pad_stack("col_local", 0, False, np.int32),
        values=pad_stack("values", np.float32(pad_value), False,
                         np.float32),
        chunk_rb=pad_stack("chunk_rb", n_rb - 1, True, np.int32),
        chunk_cb=pad_stack("chunk_cb", 0, True, np.int32),
        # pad chunks carry 0 occupancy bits -> never selected by the
        # frontier-sparse chunk selection (previously they aliased
        # window 0 and rode along whenever it was active)
        src_bits=pad_stack("src_bits", 0, True, np.uint32),
        dst_bits=pad_stack("dst_bits", 0, True, np.uint32),
        rb_occupied=jnp.asarray(np.stack(
            [np.asarray(l.rb_occupied) for l in shards]
        )),
        window=window, chunk=chunk, n_chunks=nc,
        n_row_blocks=n_rb, n_col_blocks=shards[0].n_col_blocks,
        n_vertices=V, n_shards=n_shards, v_per_shard=Vs,
        interpret=bool(interpret),
    )


def _local_layout(L: ShardedLayouts):
    """Inside shard_map: local [1, ...] slices -> this shard's
    BucketedEdges."""
    from gunrock_tpu.ops.pallas.layout import BucketedEdges

    return BucketedEdges(
        row_local=L.row_local[0], col_local=L.col_local[0],
        values=L.values[0], chunk_rb=L.chunk_rb[0],
        chunk_cb=L.chunk_cb[0], rb_occupied=L.rb_occupied[0],
        src_bits=L.src_bits[0], dst_bits=L.dst_bits[0],
        window=L.window, chunk=L.chunk, n_chunks=L.n_chunks,
        n_row_blocks=L.n_row_blocks, n_col_blocks=L.n_col_blocks,
        n_vertices=L.n_vertices,
    )


def _pallas_advance_local(L: ShardedLayouts, x_local, axis, semiring,
                          active_local=None, pad_fill=0.0):
    """all_gather x (f32[Vs] local), run this shard's bucketed Pallas
    advance over its own edges, return the shard's own output rows
    [Vs]. ``active_local``: optional bool[Vs] frontier — gathered too,
    and the advance runs the chunk-skipping sparse kernel."""
    lay = _local_layout(L)
    from gunrock_tpu.ops.pallas.semiring import (
        bucketed_semiring_spmv, bucketed_semiring_spmv_sparse)

    V, Vs, n = L.n_vertices, L.v_per_shard, L.n_shards
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)[:V]
    if active_local is None:
        y = bucketed_semiring_spmv(
            lay, x_full, semiring, interpret=L.interpret
        )
    else:
        a_full = jax.lax.all_gather(active_local, axis, tiled=True)[:V]
        y = bucketed_semiring_spmv_sparse(
            lay, x_full, a_full, semiring, interpret=L.interpret
        )
    if n * Vs > V:
        y = jnp.concatenate(
            [y, jnp.full(n * Vs - V, pad_fill, y.dtype)]
        )
    d = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(y, d * Vs, Vs)


# ---------------------------------------------------------------------------
# algorithms


def bfs(sg: ShardedGraph, src: int, mesh, max_iterations: int | None = None,
        layouts: ShardedLayouts | None = None):
    """Distributed BFS on sharded state. Returns (distances int32[V], depth).
    ``layouts`` (build_sharded_layouts side='d'): run each shard's
    frontier advance through the bucketed Pallas kernels instead of the
    XLA gather + segment reduction."""
    V, Vs = sg.n_vertices, sg.v_per_shard
    axis = mesh_axes(mesh)
    max_it = V if max_iterations is None else max_iterations

    def spmd(sg, *lay):
        vvalid, ids = _vvalid(sg, axis)
        dist0 = jnp.where(ids == src, 0, UNREACHED)
        front0 = ids == src

        def cond(c):
            it, f, d = c
            return (jax.lax.pmax(jnp.any(f).astype(jnp.int32), axis) > 0) & (
                it < max_it
            )

        def body(c):
            it, f, d = c
            if lay:
                y = _pallas_advance_local(
                    lay[0], f.astype(jnp.float32), axis, "max_times",
                    active_local=f,
                )
                reached = y > 0.0
            else:
                f_at_src = _gather(sg, f, axis, "d")
                active = f_at_src & sg.d_valid
                reached = _local_reduce(
                    sg, active.astype(jnp.int32), active, "max") > 0
            new = reached & (d == UNREACHED) & vvalid
            d = jnp.where(new, it + 1, d)
            return it + 1, new, d

        it, _, d = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
        return d, jnp.full((1,), it)

    extra = () if layouts is None else (layouts,)
    fn = jax.jit(_shard_map(
        spmd, mesh,
        in_specs=(P(axis),) * (1 + len(extra)),
        out_specs=(P(axis), P()),
    ))
    d, it = fn(sg, *extra)
    return _trim(d, V), int(it[0])


def sssp(sg: ShardedGraph, src: int, mesh, max_iterations: int | None = None,
         layouts: ShardedLayouts | None = None):
    """Distributed frontier Bellman-Ford. Returns (distances f32[V], depth).
    ``layouts`` must be built with ``pad_value=inf`` (min_plus)."""
    V = sg.n_vertices
    axis = mesh_axes(mesh)
    max_it = V if max_iterations is None else max_iterations
    BIG = jnp.float32(3.0e38)

    def spmd(sg, *lay):
        vvalid, ids = _vvalid(sg, axis)
        dist0 = jnp.where(ids == src, 0.0, jnp.inf)
        front0 = ids == src

        def cond(c):
            it, f, d = c
            return (jax.lax.pmax(jnp.any(f).astype(jnp.int32), axis) > 0) & (
                it < max_it
            )

        def body(c):
            it, f, d = c
            x = jnp.where(f, jnp.minimum(d, BIG), BIG)
            if lay:
                relaxed = _pallas_advance_local(
                    lay[0], x, axis, "min_plus", active_local=f,
                    pad_fill=jnp.inf,
                )
            else:
                x_at_src = _gather(sg, x, axis, "d")
                cand = jnp.where(
                    sg.d_valid, jnp.minimum(x_at_src + sg.d_val, BIG), BIG
                )
                relaxed = _local_reduce(sg, cand, cand < BIG, "min")
            improved = (relaxed < d) & vvalid
            d = jnp.where(improved, relaxed, d)
            return it + 1, improved, d

        it, _, d = jax.lax.while_loop(cond, body, (jnp.int32(0), front0, dist0))
        return d, jnp.full((1,), it)

    extra = () if layouts is None else (layouts,)
    fn = jax.jit(_shard_map(
        spmd, mesh,
        in_specs=(P(axis),) * (1 + len(extra)),
        out_specs=(P(axis), P()),
    ))
    d, it = fn(sg, *extra)
    return _trim(d, V), int(it[0])


def pagerank(sg: ShardedGraph, mesh, alpha: float = 0.85, tol: float = 1e-6,
             max_iterations: int = 10_000,
             layouts: ShardedLayouts | None = None):
    """Distributed weighted PageRank (reference pr.hxx semantics).
    Returns (p f32[V], iterations). ``layouts``: bucketed Pallas spread
    pass (side='d', pad_value=0)."""
    V, Vs = sg.n_vertices, sg.v_per_shard
    axis = mesh_axes(mesh)

    def spmd(sg, *lay):
        vvalid, ids = _vvalid(sg, axis)
        # out-weight sums: local on the src-grouped copy
        wsum = _local_reduce(
            sg, jnp.where(sg.s_valid, sg.s_val, 0.0), sg.s_valid, "sum", "s"
        )
        iweights = jnp.where(wsum != 0.0, alpha / wsum, 0.0)
        p0 = jnp.where(vvalid, 1.0 / V, 0.0)

        def cond(c):
            it, p, err = c
            return (err >= tol) & (it < max_iterations)

        def body(c):
            it, p, _ = c
            plast = p
            dsum = jax.lax.psum(
                jnp.sum(jnp.where((iweights == 0.0) & vvalid, alpha * plast, 0.0)),
                axis,
            )
            base = (1.0 - alpha + dsum) / V
            spread = plast * iweights  # [Vs] local
            if lay:
                local = _pallas_advance_local(
                    lay[0], spread, axis, "plus_times"
                )
            else:
                sp_at_src = _gather(sg, spread, axis, "d")
                local = _local_reduce(
                    sg, jnp.where(sg.d_valid, sp_at_src * sg.d_val, 0.0),
                    sg.d_valid, "sum",
                )
            p = jnp.where(vvalid, base + local, 0.0)
            err = jax.lax.pmax(jnp.max(jnp.abs(p - plast)), axis)
            return it + 1, p, err

        it, p, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf))
        )
        return p, jnp.full((1,), it)

    extra = () if layouts is None else (layouts,)
    fn = jax.jit(_shard_map(
        spmd, mesh,
        in_specs=(P(axis),) * (1 + len(extra)),
        out_specs=(P(axis), P()),
    ))
    p, it = fn(sg, *extra)
    return _trim(p, V), int(it[0])


def spmv(sg: ShardedGraph, x: jax.Array, mesh,
         layouts: ShardedLayouts | None = None):
    """Distributed y = A.x (y[src] = sum w * x[dst]). Returns y f32[V].
    ``layouts``: bucketed Pallas pass (side='s', pad_value=0)."""
    V, Vs, n = sg.n_vertices, sg.v_per_shard, sg.n_shards
    axis = mesh_axes(mesh)
    x_pad = jnp.zeros(n * Vs, jnp.float32).at[:V].set(jnp.asarray(x, jnp.float32))

    def spmd(sg, x_local, *lay):
        if lay:
            return _pallas_advance_local(lay[0], x_local, axis, "plus_times")
        x_at_dst = _gather(sg, x_local, axis, "s")
        return _local_reduce(
            sg, jnp.where(sg.s_valid, sg.s_val * x_at_dst, 0.0),
            sg.s_valid, "sum", "s",
        )

    extra = () if layouts is None else (layouts,)
    fn = jax.jit(_shard_map(
        spmd, mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(extra),
        out_specs=P(axis),
    ))
    return _trim(fn(sg, x_pad, *extra), V)


def kcore(sg: ShardedGraph, mesh):
    """Distributed k-core (k-jump peel; in-degrees — undirected graphs).
    Returns (k_cores int32[V], degeneracy)."""
    V = sg.n_vertices
    axis = mesh_axes(mesh)
    BIGD = jnp.int32(2**30)

    def spmd(sg):
        vvalid, ids = _vvalid(sg, axis)
        local_base = jax.lax.axis_index(axis).astype(jnp.int32) * sg.v_per_shard
        # self loops excluded from peel degrees (matches the single-chip
        # kernel's deviation from kcore.hxx — see algorithms/kcore.py)
        not_loop = sg.d_src != sg.d_dst_local + local_base
        deg = _local_reduce(
            sg, (sg.d_valid & not_loop).astype(jnp.int32), sg.d_valid, "sum"
        )

        def cond(c):
            k, deg, deleted, cores = c
            return jax.lax.pmax((~jnp.all(deleted)).astype(jnp.int32), axis) > 0

        def body(c):
            k, deg, deleted, cores = c
            # fused k-jump (see algorithms/kcore.py): raise k to the
            # minimum alive residual degree up front so every round
            # peels — no dedicated level-done rounds.
            min_rem = jax.lax.pmin(
                jnp.min(jnp.where(deleted, BIGD, deg)), axis
            )
            k = jnp.maximum(k, min_rem)
            peel = (~deleted) & (deg <= k)
            cores = jnp.where(peel, k, cores)
            deleted = deleted | peel
            peel_at_src = _gather(sg, peel, axis, "d")
            dec = _local_reduce(
                sg, (peel_at_src & sg.d_valid).astype(jnp.int32),
                sg.d_valid, "sum",
            )
            deg = deg - dec
            return k, deg, deleted, cores

        k, _, _, cores = jax.lax.while_loop(
            cond, body,
            (jnp.int32(1), deg, ~vvalid, jnp.zeros_like(deg)),
        )
        degen = jax.lax.pmax(jnp.max(cores), axis)
        return cores, jnp.full((1,), degen)

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(axis), P())))
    cores, k = fn(sg)
    return _trim(cores, V), int(k[0])


def hits(sg: ShardedGraph, mesh, max_iterations: int = 50,
         layouts: tuple | None = None):
    """Distributed HITS. Returns (auth f32[V], hub f32[V], iterations).
    ``layouts``: (push s-side, pull d-side) unit-weight ShardedLayouts
    pair — runs both update passes through the bucketed Pallas
    kernels."""
    V = sg.n_vertices
    axis = mesh_axes(mesh)

    def spmd(sg, *lay):
        vvalid, _ = _vvalid(sg, axis)
        auth0 = jnp.where(vvalid, 1.0, 0.0)
        hub0 = jnp.where(vvalid, 1.0, 0.0)

        def l2(x):
            s = jax.lax.psum(jnp.sum(x * x), axis)
            return jnp.where(s > 0, x / jnp.sqrt(s), x)

        def cond(c):
            it, auth, hub, done = c
            return (~done) & (it < max_iterations)

        def body(c):
            it, auth, hub, _ = c
            if lay:
                hub_n = l2(_pallas_advance_local(
                    lay[0], auth, axis, "plus_times"))
                auth_n = l2(_pallas_advance_local(
                    lay[1], hub, axis, "plus_times"))
            else:
                auth_at_dst = _gather(sg, auth, axis, "s")
                hub_n = l2(_local_reduce(
                    sg, jnp.where(sg.s_valid, auth_at_dst, 0.0),
                    sg.s_valid, "sum", "s",
                ))
                hub_at_src = _gather(sg, hub, axis, "d")
                auth_n = l2(_local_reduce(
                    sg, jnp.where(sg.d_valid, hub_at_src, 0.0),
                    sg.d_valid, "sum",
                ))
            # each all() must be global BEFORE the OR (single-chip
            # semantics: ALL-V auth fixpoint or ALL-V hub fixpoint; OR of
            # per-shard alls could stop with neither vector converged)
            auth_fix = jax.lax.pmin(
                jnp.all(auth_n == auth).astype(jnp.int32), axis
            )
            hub_fix = jax.lax.pmin(
                jnp.all(hub_n == hub).astype(jnp.int32), axis
            )
            done = (auth_fix > 0) | (hub_fix > 0)
            return it + 1, auth_n, hub_n, done

        it, auth, hub, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), auth0, hub0, jnp.bool_(False))
        )
        return auth, hub, jnp.full((1,), it)

    extra = () if layouts is None else tuple(layouts)
    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis),) * (1 + len(extra)),
                   out_specs=(P(axis), P(axis), P()))
    )
    auth, hub, it = fn(sg, *extra)
    return _trim(auth, V), _trim(hub, V), int(it[0])


def color(sg: ShardedGraph, mesh, seed: int = 0,
          max_iterations: int | None = None):
    """Distributed Luby/Jones-Plassmann coloring (single-chip
    algorithms/color.py semantics: two colors per round over out-edge
    neighbor max/min of uncolored priorities). Returns (colors, rounds)."""
    V, Vs = sg.n_vertices, sg.v_per_shard
    axis = mesh_axes(mesh)
    max_it = V if max_iterations is None else max_iterations
    # unique priorities in [1, V]: a global permutation, replicated compute
    perm = jax.random.permutation(jax.random.PRNGKey(seed), V).astype(jnp.int32)
    perm_pad = jnp.zeros(sg.n_shards * Vs, jnp.int32).at[:V].set(perm)

    def spmd(sg, perm_local):
        vvalid, ids = _vvalid(sg, axis)
        # int32 priorities: a float32 cast would collide for V > 2^24
        # (two equal-rounded neighbors then block each other forever)
        randf = perm_local + 1  # int32 in [1, V], 0 = identity
        big = jnp.int32(V + 2)
        # self-loop edges are irrelevant (color.hxx:126-130)
        local_base = (
            jax.lax.axis_index(axis).astype(jnp.int32) * Vs
        )
        s_self = sg.s_dst == sg.s_src_local + local_base
        rel_edge = sg.s_valid & (~s_self)
        d_self = sg.d_src == sg.d_dst_local + local_base
        rel_edge_d = sg.d_valid & (~d_self)
        # directed graphs additionally scan in-edges (the d-grouped copy)
        # so properness holds on the underlying undirected graph
        both_sides = not sg.properties.symmetric
        colors0 = jnp.where(vvalid, -1, 0)

        def nbr_scan(x):
            """max over undirected neighbors of x (0 = no neighbor)."""
            x_at_dst = _gather(sg, x, axis, "s")
            m = _local_reduce(
                sg, jnp.where(rel_edge, x_at_dst, 0), rel_edge, "max", "s"
            )
            if both_sides:
                x_at_src = _gather(sg, x, axis, "d")
                m = jnp.maximum(
                    m,
                    _local_reduce(
                        sg, jnp.where(rel_edge_d, x_at_src, 0),
                        rel_edge_d, "max",
                    ),
                )
            return jnp.maximum(m, 0)

        def cond(c):
            it, colors = c
            return (
                jax.lax.pmax(jnp.any(colors == -1).astype(jnp.int32), axis) > 0
            ) & (it < max_it)

        def body(c):
            it, colors = c
            unc = colors == -1
            nbr_max = nbr_scan(jnp.where(unc, randf, 0))
            inv_max = nbr_scan(jnp.where(unc, big - randf, 0))
            has_nbr = inv_max > 0
            nbr_min = big - inv_max
            colormax = unc & (randf > nbr_max)
            colormin = unc & has_nbr & (randf < nbr_min) & ~colormax
            colors = jnp.where(colormax, it * 2, colors)
            colors = jnp.where(colormin, it * 2 + 1, colors)
            return it + 1, colors

        it, colors = jax.lax.while_loop(cond, body, (jnp.int32(0), colors0))
        return colors, jnp.full((1,), it)

    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis), P()))
    )
    colors, it = fn(sg, perm_pad)
    return _trim(colors, V), int(it[0])


def color_greedy(sg: ShardedGraph, mesh, K: int = 32,
                 max_iterations: int | None = None,
                 phase_spread: bool = True):
    """Distributed speculative windowed-mex greedy coloring (single-chip
    ``algorithms/color.color_kernel_greedy`` semantics: rank-init, mex
    over per-window counts of outranking-neighbor colors, immediate
    conflict re-mex, K-wide phases with rank%K spread).

    Sharded state: colors[Vs] and cnt[Vs, K] live on the owner — memory
    stays V/n. Per round ONE boundary exchange of the colors vector (the
    d-side gather; plus the s-side on directed inputs) feeds a local
    scatter-add rebuild of cnt; everything else is elementwise-local
    with O(1) scalar pmax collectives for stall/convergence.
    Priorities are the global vertex-id order (deterministic — relabel
    to change). Returns (colors, rounds)."""
    V, Vs = sg.n_vertices, sg.v_per_shard
    axis = mesh_axes(mesh)
    max_it = 4 * V if max_iterations is None else max_iterations
    INVALID = jnp.int32(-1)

    def spmd(sg):
        vvalid, _ = _vvalid(sg, axis)
        local_base = jax.lax.axis_index(axis).astype(jnp.int32) * Vs
        lanes_k = jnp.arange(K, dtype=jnp.int32)[None, :]
        # outranking = strictly smaller global id (also drops self loops)
        d_dst_g = sg.d_dst_local + local_base
        d_rel = sg.d_valid & (sg.d_src < d_dst_g)
        both = not sg.properties.symmetric
        if both:
            s_src_g = sg.s_src_local + local_base
            s_rel = sg.s_valid & (sg.s_dst < s_src_g)

        rank = jnp.zeros(Vs, jnp.int32).at[sg.d_dst_local].add(
            d_rel.astype(jnp.int32), mode="drop"
        )
        if both:
            rank = rank.at[sg.s_src_local].add(
                s_rel.astype(jnp.int32), mode="drop"
            )
        colors0 = jnp.minimum(rank, K - 1)  # phantoms: rank 0 -> color 0

        def build_cnt(colors, base):
            """cnt[v, k] = #outranking neighbors of v with color base+k,
            rebuilt per round from one boundary exchange of colors."""
            far = _gather(sg, colors, axis, "d")  # color at d-edge src
            inw = (far >= base) & (far < base + K)
            idx = sg.d_dst_local * K + jnp.clip(far - base, 0, K - 1)
            cnt = jnp.zeros(Vs * K, jnp.int32).at[idx].add(
                (d_rel & inw).astype(jnp.int32), mode="drop"
            )
            if both:
                far_s = _gather(sg, colors, axis, "s")
                inw_s = (far_s >= base) & (far_s < base + K)
                idx_s = sg.s_src_local * K + jnp.clip(far_s - base, 0, K - 1)
                cnt = cnt.at[idx_s].add(
                    (s_rel & inw_s).astype(jnp.int32), mode="drop"
                )
            return cnt.reshape(Vs, K)

        def pany(x):
            return jax.lax.pmax(x.astype(jnp.int32), axis) > 0

        def cond(c):
            it, base, colors, changed = c
            return (
                changed | pany(jnp.any(vvalid & (colors == INVALID)))
            ) & (it < max_it)

        def body(c):
            it, base, colors, _ = c
            cnt = build_cnt(colors, base)
            unc = vvalid & (colors == INVALID)
            inwin = vvalid & (colors >= base) & (colors < base + K)
            koff = jnp.clip(colors - base, 0, K - 1)
            cnt_own = jnp.sum(
                cnt * ((koff[:, None] == lanes_k) & inwin[:, None]), axis=1
            )
            conflict = inwin & (cnt_own > 0)
            cand = unc | conflict
            free = cnt == 0
            mex = jnp.where(
                jnp.any(free, axis=1), jnp.argmax(free, axis=1), K
            ).astype(jnp.int32)
            take = cand & (mex < K)
            new_colors = jnp.where(conflict, INVALID, colors)
            new_colors = jnp.where(take, base + mex, new_colors)
            any_changed = pany(jnp.any(new_colors != colors))
            unc2 = vvalid & (new_colors == INVALID)
            stall = ~any_changed & pany(jnp.any(unc2))
            base_next = base + jnp.where(stall, K, 0)
            if phase_spread:
                seed = base_next + rank % K
                colors_next = jnp.where(stall & unc2, seed, new_colors)
            else:
                colors_next = new_colors
            return it + 1, base_next, colors_next, any_changed | stall

        it, _, colors, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), colors0, jnp.bool_(True)),
        )
        return colors, jnp.full((1,), it)

    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis),),
                   out_specs=(P(axis), P()))
    )
    colors, it = fn(sg)
    return _trim(colors, V), int(it[0])


def ppr(sg: ShardedGraph, seed: int, mesh, alpha: float = 0.15,
        epsilon: float = 1e-6, max_iterations: int | None = None):
    """Distributed push-style personalized PageRank (single-chip
    algorithms/ppr.py semantics). Returns (p f32[V], iterations)."""
    V = sg.n_vertices
    axis = mesh_axes(mesh)
    max_it = (2 * V) if max_iterations is None else max_iterations

    def spmd(sg):
        vvalid, ids = _vvalid(sg, axis)
        deg = _local_reduce(
            sg, sg.s_valid.astype(jnp.float32), sg.s_valid, "sum", "s"
        )
        p0 = jnp.zeros_like(deg)
        r0 = jnp.where(ids == seed, 1.0, 0.0)
        front0 = ids == seed
        c1 = 2.0 * alpha / (1.0 + alpha)
        c2 = (1.0 - alpha) / (1.0 + alpha)
        thresh = deg * epsilon

        def cond(c):
            it, front, p, r, rp = c
            return (
                jax.lax.pmax(jnp.any(front).astype(jnp.int32), axis) > 0
            ) & (it < max_it)

        def body(c):
            it, front, p, r, rp = c
            # filter: absorb residual, reset r' on the frontier
            p = jnp.where(front, p + c1 * r, p)
            rp = jnp.where(front, 0.0, rp)
            # advance: push along frontier out-edges
            pv = jnp.where(front, c2 * r / jnp.maximum(deg, 1.0), 0.0)
            pv_at_src = _gather(sg, pv, axis, "d")
            upd = _local_reduce(
                sg, jnp.where(sg.d_valid, pv_at_src, 0.0), sg.d_valid, "sum"
            )
            new_rp = rp + upd
            new_front = (rp < thresh) & (new_rp >= thresh) & vvalid
            return it + 1, new_front, p, new_rp, new_rp

        it, _, p, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), front0, p0, r0, r0)
        )
        return p, jnp.full((1,), it)

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(axis), P())))
    p, it = fn(sg)
    return _trim(p, V), int(it[0])


def bc(sg: ShardedGraph, src: int, mesh):
    """Distributed Brandes betweenness from one source (single-chip
    algorithms/bc.py semantics: 0.5-scaled, source excluded).
    Returns bc_values f32[V]."""
    V = sg.n_vertices
    axis = mesh_axes(mesh)

    def spmd(sg):
        vvalid, ids = _vvalid(sg, axis)
        labels0 = jnp.where(ids == src, 0, -1)
        sigma0 = jnp.where(ids == src, 1.0, 0.0)
        front0 = ids == src

        def fcond(c):
            it, f, labels, sigma = c
            return (jax.lax.pmax(jnp.any(f).astype(jnp.int32), axis) > 0) & (
                it < V
            )

        def fbody(c):
            it, f, labels, sigma = c
            fs = jnp.where(f, sigma, 0.0)
            fs_at_src = _gather(sg, fs, axis, "d")
            active = (fs_at_src > 0.0) & sg.d_valid
            reached = (
                _local_reduce(sg, active.astype(jnp.int32), active, "max") > 0
            )
            new = reached & (labels == -1) & vvalid
            labels = jnp.where(new, it + 1, labels)
            sig_add = _local_reduce(
                sg, jnp.where(active, fs_at_src, 0.0), active, "sum",
                exact=True,  # sigma dynamic range: see _local_reduce
            )
            sigma = jnp.where(new, sig_add, sigma)
            return it + 1, new, labels, sigma

        depth, _, labels, sigma = jax.lax.while_loop(
            fcond, fbody, (jnp.int32(0), front0, labels0, sigma0)
        )
        depth = jax.lax.pmax(depth, axis)
        sigma_safe = jnp.where(sigma > 0, sigma, 1.0)
        # labels at the dst end of src-grouped edges: static after forward
        lab_at_dst = _gather(sg, labels.astype(jnp.float32), axis, "s")

        def bcond(c):
            d, delta = c
            return d >= 1

        def bbody(c):
            d, delta = c
            # q[v] = (1 + delta[v]) / sigma[v] for label==d+1 vertices
            q = jnp.where(
                labels == d + 1, (1.0 + delta) / sigma_safe, 0.0
            )
            q_at_dst = _gather(sg, q, axis, "s")
            on_level = sg.s_valid & (lab_at_dst == jnp.float32(d + 1))
            add = _local_reduce(
                sg, jnp.where(on_level, q_at_dst, 0.0), on_level, "sum", "s",
                exact=True,  # q = (1+delta)/sigma inherits sigma's range
            )
            delta = jnp.where(
                (labels == d) & vvalid, delta + sigma_safe * add, delta
            )
            return d - 1, delta

        _, delta = jax.lax.while_loop(
            bcond, bbody, (depth - 1, jnp.zeros_like(sigma))
        )
        bc_v = 0.5 * delta
        bc_v = jnp.where(ids == src, 0.0, bc_v)
        return bc_v

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=P(axis)))
    return _trim(fn(sg), V)


def geo(sg: ShardedGraph, latitude, longitude, mesh,
        total_iterations: int = 3, spatial_iterations: int = 1000):
    """Distributed geolocation (single-chip algorithms/geo.py semantics,
    neighbor scans over out-edges). Positions sharded; one boundary
    exchange of (lat, lon) per outer iteration — the Weiszfeld inner loop
    is fully device-local. Returns (lat f32[V], lon f32[V])."""
    from gunrock_tpu.algorithms.geo import haversine, midpoint

    V, Vs, n = sg.n_vertices, sg.v_per_shard, sg.n_shards
    axis = mesh_axes(mesh)
    lat_pad = jnp.full(n * Vs, jnp.nan, jnp.float32).at[:V].set(
        jnp.asarray(latitude, jnp.float32))
    lon_pad = jnp.full(n * Vs, jnp.nan, jnp.float32).at[:V].set(
        jnp.asarray(longitude, jnp.float32))

    def spmd(sg, lat, lon):
        vvalid, ids = _vvalid(sg, axis)
        seg = sg.s_src_local
        E = seg.shape[0]
        eid = jnp.arange(E, dtype=jnp.int32)

        def seg_sum(v):
            # NOT cumsum-difference: Weiszfeld's dinv reaches ~1e30 by
            # design (zero-distance correction), and a shard-wide f32
            # prefix sum through such a lane cancels catastrophically in
            # every later segment (verified: later vertices collapse to
            # 0). segment_sum never mixes segments.
            return jax.ops.segment_sum(
                v, seg, num_segments=Vs, indices_are_sorted=True
            )

        def outer(c):
            it, lat, lon = c
            nlat = _gather(sg, lat, axis, "s")
            nlon = _gather(sg, lon, axis, "s")
            labeled = ~jnp.isnan(lat)
            nb_ok = (~jnp.isnan(nlat)) & sg.s_valid
            n_valid = seg_sum(nb_ok.astype(jnp.int32))
            unl = (~labeled) & vvalid

            first_e = jnp.full(Vs, E, jnp.int32).at[seg].min(
                jnp.where(nb_ok, eid, E))
            last_e = jnp.full(Vs, -1, jnp.int32).at[seg].max(
                jnp.where(nb_ok, eid, -1))
            fe = jnp.minimum(first_e, E - 1)
            le = jnp.maximum(last_e, 0)
            n1_lat, n1_lon = nlat[fe], nlon[fe]
            n2_lat, n2_lon = nlat[le], nlon[le]
            mid_lat, mid_lon = midpoint(n1_lat, n1_lon, n2_lat, n2_lon)

            zlat = jnp.where(nb_ok, nlat, 0.0)
            zlon = jnp.where(nb_ok, nlon, 0.0)
            denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
            y_lat, y_lon = seg_sum(zlat) / denom, seg_sum(zlon) / denom

            # Weiszfeld under haversine — exact mirror of the single-chip
            # algorithms/geo.py wstep (zero-distance rinv correction +
            # per-vertex done-masking); every op is shard-local.
            eps_w = 1e-3

            def wstep(_, s):
                y_lat, y_lon, out_lat, out_lon, done = s
                d = haversine(nlat, nlon, y_lat[seg], y_lon[seg])
                dinv = jnp.where(nb_ok & (d != 0), 1.0 / jnp.maximum(d, 1e-30), 0.0)
                nonzeros = seg_sum((nb_ok & (d != 0)).astype(jnp.int32))
                dinvs = seg_sum(dinv)
                dsafe = jnp.maximum(dinvs, 1e-30)
                t_lat = seg_sum(dinv * zlat) / dsafe
                t_lon = seg_sum(dinv * zlon) / dsafe
                num_zeros = n_valid - nonzeros
                all_zero = num_zeros == n_valid
                r_lat = (t_lat - y_lat) * dinvs
                r_lon = (t_lon - y_lon) * dinvs
                r = jnp.sqrt(r_lat**2 + r_lon**2)
                rinv = jnp.where(
                    r == 0, 0.0,
                    num_zeros.astype(jnp.float32) / jnp.maximum(r, 1e-30),
                )
                y1_lat = jnp.where(
                    num_zeros == 0, t_lat,
                    jnp.maximum(0.0, 1 - rinv) * t_lat
                    + jnp.minimum(1.0, rinv) * y_lat,
                )
                y1_lon = jnp.where(
                    num_zeros == 0, t_lon,
                    jnp.maximum(0.0, 1 - rinv) * t_lon
                    + jnp.minimum(1.0, rinv) * y_lon,
                )
                step = jnp.sqrt((y_lat - y1_lat) ** 2 + (y_lon - y1_lon) ** 2)
                newly_done = ~done & (all_zero | (step < eps_w))
                out_lat = jnp.where(
                    newly_done, jnp.where(all_zero, y_lat, y1_lat), out_lat
                )
                out_lon = jnp.where(
                    newly_done, jnp.where(all_zero, y_lon, y1_lon), out_lon
                )
                done = done | newly_done
                y_lat = jnp.where(done, y_lat, y1_lat)
                y_lon = jnp.where(done, y_lon, y1_lon)
                return y_lat, y_lon, out_lat, out_lon, done

            # derive the done mask from a varying value so the fori carry
            # keeps consistent manual axes under shard_map (VMA rule)
            med0 = (y_lat, y_lon, y_lat, y_lon, y_lat > jnp.inf)
            my_lat, my_lon, out_lat, out_lon, done = jax.lax.fori_loop(
                0, spatial_iterations, wstep, med0
            )
            med_lat = jnp.where(done, out_lat, my_lat)
            med_lon = jnp.where(done, out_lon, my_lon)
            new_lat = jnp.where(
                unl & (n_valid == 1), n1_lat,
                jnp.where(unl & (n_valid == 2), mid_lat,
                          jnp.where(unl & (n_valid > 2), med_lat, lat)))
            new_lon = jnp.where(
                unl & (n_valid == 1), n1_lon,
                jnp.where(unl & (n_valid == 2), mid_lon,
                          jnp.where(unl & (n_valid > 2), med_lon, lon)))
            # date-line wrap, bit-identical to the single-chip kernel
            new_lon = jnp.where(
                jnp.isnan(new_lon), new_lon,
                jnp.mod(new_lon + 180.0, 360.0) - 180.0,
            )
            return it + 1, new_lat, new_lon

        def cond(c):
            it, lat, lon = c
            return it < total_iterations

        _, lat, lon = jax.lax.while_loop(cond, outer, (jnp.int32(0), lat, lon))
        return lat, lon

    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=(P(axis), P(axis)))
    )
    lat, lon = fn(sg, lat_pad, lon_pad)
    return _trim(lat, V), _trim(lon, V)


def mst(sg: ShardedGraph, mesh, max_rounds: int | None = None):
    """Distributed Boruvka MST weight. Edges sharded; the component
    labels are an O(V) replicated array (the union-find frontier is
    global by nature — documented deviation, like the reference's
    host-side super-vertex count, mst.hxx:245-267).
    Returns (total_weight, n_rounds)."""
    V, Vs, n = sg.n_vertices, sg.v_per_shard, sg.n_shards
    axis = mesh_axes(mesh)
    max_r = 64 if max_rounds is None else max_rounds
    BIG = jnp.float32(3.0e38)
    V_pad = n * Vs

    def spmd(sg):
        local_base = jax.lax.axis_index(axis).astype(jnp.int32) * Vs
        Ed = sg.ed_per_shard
        e_src_g = sg.d_src  # global src per local edge
        e_dst_g = sg.d_dst_local + local_base
        e_w = sg.d_val
        e_valid = sg.d_valid & (e_src_g != e_dst_g)
        # globally-unique edge ids make the per-component argmin selection
        # consistent across devices (mirror pairs then pick the same edge)
        eid = jax.lax.axis_index(axis).astype(jnp.int32) * Ed + jnp.arange(
            Ed, dtype=jnp.int32
        )
        iota_v = jnp.arange(V_pad, dtype=jnp.int32)
        comp0 = iota_v
        SENT = jnp.int32(2**30)

        def scatter_min(vals, keys, mask, init):
            return (
                jnp.full(V_pad, init, vals.dtype)
                .at[jnp.where(mask, keys, 0)]
                .min(jnp.where(mask, vals, init))
            )

        def cond(c):
            r, comp, total, done = c
            return (~done) & (r < max_r)

        def body(c):
            r, comp, total, _ = c
            cs = comp[e_src_g]
            cd = comp[e_dst_g]
            cross = e_valid & (cs != cd)
            w = jnp.where(cross, e_w, BIG)
            # phase 1: per-component min edge weight (edges touch both
            # endpoint components), combined over devices
            wmin = jax.lax.pmin(
                jnp.minimum(
                    scatter_min(w, cs, cross, BIG),
                    scatter_min(w, cd, cross, BIG),
                ),
                axis,
            )
            # phase 2: among weight-minimal edges, the smallest global
            # edge id — a single consistent winner per component
            em_s = cross & (w <= wmin[cs])
            em_d = cross & (w <= wmin[cd])
            sel_eid = jax.lax.pmin(
                jnp.minimum(
                    scatter_min(eid, cs, em_s, SENT),
                    scatter_min(eid, cd, em_d, SENT),
                ),
                axis,
            )
            has_edge = sel_eid < SENT
            # phase 3: the winning device publishes the winner's other
            # endpoint for each component
            win_s = em_s & (eid == sel_eid[cs])
            win_d = em_d & (eid == sel_eid[cd])
            other = jax.lax.pmin(
                jnp.minimum(
                    scatter_min(e_dst_g, cs, win_s, SENT),
                    scatter_min(e_src_g, cd, win_d, SENT),
                ),
                axis,
            )
            target = jnp.where(
                has_edge, comp[jnp.clip(other, 0, V_pad - 1)], iota_v
            )
            # mirror pairs (a<->b selected the same edge) count it once
            t_of_t = jnp.take(target, jnp.clip(target, 0, V_pad - 1))
            mirror = has_edge & (t_of_t == iota_v)
            count_me = has_edge & (
                (~mirror) | (iota_v < target)
            ) & (comp[iota_v] == iota_v)  # roots only
            add = jnp.sum(jnp.where(count_me, wmin, 0.0))
            # union: root -> target's root, mirror 2-cycles broken by id
            parent = jnp.where(
                (comp[iota_v] == iota_v) & has_edge, target, iota_v
            )
            parent = jnp.where(mirror & (iota_v < target), iota_v, parent)

            def jump(_, p):
                return p[p]

            # pointer doubling halves chain depth per step: ceil(log2 V)
            # steps canonicalize ANY merge chain (a fixed small count
            # would leave deep path-graph chains uncompressed and
            # double-count their connecting edges next round)
            n_jumps = max(1, (V_pad - 1).bit_length())
            parent = jax.lax.fori_loop(0, n_jumps, jump, parent)
            comp = parent[comp]
            done = ~jnp.any(has_edge)
            total = total + add
            return r + 1, comp, total, done

        r, comp, total, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), comp0, jnp.float32(0.0), jnp.bool_(False))
        )
        # every device computed identical replicated totals
        return jnp.full((1,), total), jnp.full((1,), r)

    fn = jax.jit(_shard_map(spmd, mesh, in_specs=(P(axis),), out_specs=(P(), P())))
    total, r = fn(sg)
    return float(total[0]), int(r[0])


def spgemm_count(sg_a: ShardedGraph, graph_b: Graph, mesh,
                 block_products: int = 1_000_000):
    """Distributed C = A.B structure analysis: A's rows sharded (the
    src-grouped copy IS the row partition), B replicated; each device
    runs the ESC contraction on its row block — C rows are disjoint, so
    nnz and the value checksum combine with one scalar psum.
    Returns (nnz, checksum)."""
    V, Vs, n = sg_a.n_vertices, sg_a.v_per_shard, sg_a.n_shards
    axis = mesh_axes(mesh)
    Es = sg_a.es_per_shard
    b_off = graph_b.row_offsets
    b_col = graph_b.col_indices
    b_val = graph_b.values
    deg_b_h = np.diff(np.asarray(b_off))
    # per-device expansion capacity (host-computed static bound)
    s_dst_h = np.asarray(sg_a.s_dst).reshape(n, Es)
    s_valid_h = np.asarray(sg_a.s_valid).reshape(n, Es)
    exp = np.where(s_valid_h, deg_b_h[s_dst_h], 0).sum(axis=1)
    cap = 1 << max(int(e) for e in exp).bit_length() if exp.max() else 8
    cap = max(cap, 8)

    def spmd(sg, b_off, b_col, b_val):
        src_l = sg.s_src_local
        dst = sg.s_dst
        val = sg.s_val
        valid = sg.s_valid
        counts = jnp.where(valid, b_off[dst + 1] - b_off[dst], 0)
        off = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])
        actual = off[-1]
        t = jnp.arange(cap, dtype=jnp.int32)
        tvalid = t < actual
        # product -> A-edge id and (i, b_e) via scatter+cumsum telescopes
        # (same rework as algorithms/spgemm: searchsorted paid log(Es)
        # serialized gathers per product slot)
        marks = jnp.zeros(cap + 1, jnp.int32).at[off[:-1]].add(1, mode="drop")
        a_id = jnp.clip(jnp.cumsum(marks[:cap]) - 1, 0, Es - 1)
        from gunrock_tpu.algorithms.spgemm import _piecewise_expand

        b_start = b_off[dst]
        i_raw, b_e = _piecewise_expand(src_l, b_start, off[:-1], cap)
        b_e = jnp.clip(b_e, 0, b_col.shape[0] - 1)
        i = jnp.where(tvalid, i_raw, Vs)
        j = jnp.where(tvalid, b_col[b_e], jnp.int32(2**30))
        v = jnp.where(tvalid, val[a_id] * b_val[b_e], 0.0)
        i_s, j_s, v_s = jax.lax.sort((i, j, v), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), (i_s[1:] != i_s[:-1]) | (j_s[1:] != j_s[:-1])]
        )
        nnz_local = jnp.sum((first & (i_s < Vs)).astype(jnp.int32))
        checksum_local = jnp.sum(v_s)
        return (
            jnp.full((1,), jax.lax.psum(nnz_local, axis)),
            jnp.full((1,), jax.lax.psum(checksum_local, axis)),
        )

    fn = jax.jit(
        _shard_map(spmd, mesh, in_specs=(P(axis), P(), P(), P()),
                   out_specs=(P(), P()))
    )
    nnz, csum = fn(sg_a, b_off, b_col, b_val)
    return int(nnz[0]), float(csum[0])


def tc_ring(graph: Graph, mesh):
    """Distributed triangle counting with a SHARDED DAG adjacency.

    Round-2 memory fix for the last replicated structure (round-1 VERDICT:
    "TC's DAG adjacency is replicated"): the degree-ordered DAG is row-
    sharded by vertex owner; DAG edges (u, v) are bucketed by
    (owner(u), owner(v)). Each device generates wedge lists from its OWN
    adjacency shard and binary-searches them against a second shard that
    ROTATES around the ring via ``ppermute`` — after n steps every
    (u-owner, v-owner) bucket has been processed against its target
    shard. Per-device residency: 2 shards = 2E/n; ICI traffic: one full
    adjacency circulation (E ints) per run. Returns (counts int32[V],
    total)."""
    from gunrock_tpu.algorithms.tc import _search_steps, build_dag

    V = graph.n_vertices
    axis = mesh_axes(mesh)
    n = mesh.size
    Vs = -(-max(V, 1) // n)
    dag_offsets, dag_adj, edge_u, edge_v, _udeg = build_dag(graph)
    deg = np.diff(dag_offsets)
    D = int(deg.max()) if dag_adj.size else 1
    steps = _search_steps(D)

    # --- shard adjacency by row owner, rebased offsets, padded ---
    row_owner_start = np.minimum(np.arange(n) * Vs, V)
    row_owner_end = np.minimum(row_owner_start + Vs, V)
    shard_sizes = [
        int(dag_offsets[e] - dag_offsets[s])
        for s, e in zip(row_owner_start, row_owner_end)
    ]
    A = max(max(shard_sizes), 1)
    adj_sh = np.zeros((n, A), np.int32)
    offs_sh = np.zeros((n, Vs + 1), np.int32)
    for d in range(n):
        s, e = row_owner_start[d], row_owner_end[d]
        lo, hi = int(dag_offsets[s]), int(dag_offsets[e])
        adj_sh[d, : hi - lo] = dag_adj[lo:hi]
        o = dag_offsets[s : e + 1] - lo
        offs_sh[d, : o.size] = o
        offs_sh[d, o.size :] = o[-1] if o.size else 0

    # --- bucket DAG edges by (owner(u), owner(v)) ---
    ou = edge_u // Vs
    ov = edge_v // Vs
    r_of = (ov - ou) % n  # ring step at which this bucket is processed
    order = np.lexsort((edge_u, r_of, ou))
    eu_s, ev_s = edge_u[order], edge_v[order]
    ou_s, r_s = ou[order], r_of[order]
    counts_b = np.zeros((n, n), np.int64)
    np.add.at(counts_b, (ou_s, r_s), 1)
    B = int(counts_b.max()) if eu_s.size else 1
    B = max(B, 1)
    eu_b = np.full((n, n, B), -1, np.int32)
    ev_b = np.full((n, n, B), -1, np.int32)
    starts = np.zeros((n, n), np.int64)
    np.cumsum(counts_b.reshape(-1)[:-1], out=starts.reshape(-1)[1:])
    rank = np.arange(eu_s.size, dtype=np.int64) - starts[ou_s, r_s]
    eu_b[ou_s, r_s, rank] = eu_s
    ev_b[ou_s, r_s, rank] = ev_s

    adj_j = jnp.asarray(adj_sh.reshape(-1))  # [n*A] sharded
    offs_j = jnp.asarray(offs_sh.reshape(-1))  # [n*(Vs+1)] sharded
    eu_j = jnp.asarray(eu_b.reshape(n, -1).reshape(-1))  # [n*(n*B)]
    ev_j = jnp.asarray(ev_b.reshape(n, -1).reshape(-1))

    perm = [(i, (i - 1) % n) for i in range(n)]  # shift shards backward

    def spmd(adj, offs, eu, ev):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        my_adj, my_offs = adj, offs
        eu3 = eu.reshape(n, B)
        ev3 = ev.reshape(n, B)

        def ring_step(r, carry):
            rot_adj, rot_offs, counts = carry
            u = jax.lax.dynamic_slice(eu3, (r, 0), (1, B))[0]
            v = jax.lax.dynamic_slice(ev3, (r, 0), (1, B))[0]
            valid_e = u >= 0
            ul = jnp.where(valid_e, u - d * Vs, 0)
            vl = jnp.where(valid_e, v - ((d + r) % n) * Vs, 0)
            base = my_offs[ul]
            du = my_offs[ul + 1] - base
            j = jnp.arange(D, dtype=jnp.int32)[None, :]
            valid_y = (j < du[:, None]) & valid_e[:, None]
            y = my_adj[jnp.where(valid_y, base[:, None] + j, 0)]
            lo = jnp.broadcast_to(rot_offs[vl][:, None], y.shape)
            hi0 = rot_offs[vl + 1][:, None]
            hi = jnp.broadcast_to(hi0, y.shape)

            def sstep(_, lh):
                lo, hi = lh
                active = lo < hi
                mid = (lo + hi) // 2
                go_right = rot_adj[jnp.minimum(mid, rot_adj.shape[0] - 1)] < y
                nlo = jnp.where(go_right, mid + 1, lo)
                nhi = jnp.where(go_right, hi, mid)
                return (
                    jnp.where(active, nlo, lo),
                    jnp.where(active, nhi, hi),
                )

            lo, hi = jax.lax.fori_loop(0, steps, sstep, (lo, hi))
            found = valid_y & (lo < hi0) & (
                rot_adj[jnp.minimum(lo, rot_adj.shape[0] - 1)] == y
            )
            f32 = found.astype(jnp.int32)
            per_edge = jnp.sum(f32, axis=1)
            counts = counts.at[jnp.where(found, y, V)].add(f32, mode="drop")
            counts = counts.at[jnp.where(valid_e, u, V)].add(
                per_edge, mode="drop"
            )
            counts = counts.at[jnp.where(valid_e, v, V)].add(
                per_edge, mode="drop"
            )
            rot_adj = jax.lax.ppermute(rot_adj, axis, perm)
            rot_offs = jax.lax.ppermute(rot_offs, axis, perm)
            return rot_adj, rot_offs, counts

        # derive from a varying value so the fori carry keeps consistent
        # manual axes under shard_map (VMA rule)
        counts0 = jnp.zeros(V, jnp.int32) + (my_adj[0] - my_adj[0])
        _, _, counts = jax.lax.fori_loop(
            0, n, ring_step, (my_adj, my_offs, counts0)
        )
        return jax.lax.psum(counts, axis)

    fn = jax.jit(
        _shard_map(
            spmd, mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
    )
    counts = fn(adj_j, offs_j, eu_j, ev_j)
    return counts, int(jnp.sum(counts))
