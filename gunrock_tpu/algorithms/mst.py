"""Minimum spanning tree/forest (parallel Borůvka).

Role of reference include/gunrock/algorithms/mst.hxx — per round over the
undirected edge frontier:

1. per-component minimum cut-edge weight via atomic-min on both endpoint
   roots (mst.hxx:130-149),
2. per-component minimum edge *id* among weight-ties (consistent ordering
   prevents cycles, mst.hxx:151-174),
3. ``add_to_mst``: each component adds its chosen edge unless the two
   components chose the same edge (dedup by ``source < dest ||
   min_neighbors[roots[dest]] != e``), hooks the component onto the
   destination's root, decrements the super-vertex count
   (mst.hxx:177-208),
4. pointer jumping compresses root chains (mst.hxx:211-224);
   converges at one super vertex; throws if a round makes no progress
   (disconnected input, mst.hxx:245-251).

TPU redesign: rounds are a ``lax.while_loop``; the atomic min/CAS races
become scatter-min reductions keyed by component root (both endpoints);
pointer jumping is a fixed log-bound ``fori_loop``. Unlike the reference,
disconnected inputs are supported: the loop converges on a minimum
spanning *forest* when no component can grow (``require_connected=True``
restores the reference's exception behavior).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options

_WMAX = jnp.float32(jnp.finfo(jnp.float32).max)


@dataclasses.dataclass
class Param:
    require_connected: bool = False


@dataclasses.dataclass
class Result:
    mst_weight: float
    mst_edges: jax.Array  # bool[E] over CSR edge ids (chosen edges)
    n_components: int
    elapsed_ms: float


def mst_kernel(graph: Graph, max_rounds: int | None = None):
    """Pure Borůvka. Returns (mst_weight, mst_edge_mask bool[E],
    n_components)."""
    V, E = graph.n_vertices, graph.n_edges
    if E == 0:
        return (
            jnp.float32(0.0),
            jnp.zeros(0, dtype=bool),
            jnp.int32(V),
        )
    src = graph.edge_src
    dst = graph.col_indices
    w = graph.values
    eid = jnp.arange(E, dtype=jnp.int32)
    # log2(V) rounds suffice for Boruvka; +2 slack
    max_r = (int(np.ceil(np.log2(max(V, 2)))) + 2) if max_rounds is None else max_rounds
    jump_steps = int(np.ceil(np.log2(max(V, 2)))) + 1

    def body(c):
        roots, weight, in_mst, n_comp, progress = c
        rs, rd = roots[src], roots[dst]
        cut = (src < dst) & (rs != rd)
        # 1. min cut-edge weight per component (both sides)
        cand_w = jnp.where(cut, w, _WMAX)
        min_w = jnp.full(V, _WMAX, jnp.float32)
        min_w = min_w.at[rs].min(cand_w)
        min_w = min_w.at[rd].min(cand_w)
        # 2. min edge id among weight ties per component
        is_min_s = cut & (w == min_w[rs])
        is_min_d = cut & (w == min_w[rd])
        min_e = jnp.full(V, E, jnp.int32)
        min_e = min_e.at[rs].min(jnp.where(is_min_s, eid, E))
        min_e = min_e.at[rd].min(jnp.where(is_min_d, eid, E))
        # 3. add chosen edges (one per component, deduped)
        comp_has = min_w < _WMAX
        e = jnp.where(comp_has, jnp.minimum(min_e, E - 1), 0)
        eu, ev, ew = src[e], dst[e], w[e]
        comp_ids = jnp.arange(V, dtype=jnp.int32)
        # orient: the chosen edge leaves component v
        from_v = roots[eu] == comp_ids
        s_v = jnp.where(from_v, eu, ev)
        d_v = jnp.where(from_v, ev, eu)
        other_root = roots[d_v]
        dedup = (s_v < d_v) | (min_e[other_root] != min_e)
        add = comp_has & dedup
        weight = weight + jnp.sum(jnp.where(add, ew, 0.0))
        in_mst = in_mst.at[jnp.where(add, min_e, E)].set(True, mode="drop")
        n_added = jnp.sum(add.astype(jnp.int32))
        # hook: component -> destination's root; compress the component map
        # by pointer jumping (mst.hxx:211-224) before applying to vertices
        new_roots = jnp.where(add, other_root, comp_ids)

        def jump(_, r):
            return r[r]

        new_roots = jax.lax.fori_loop(0, jump_steps, jump, new_roots)
        roots = new_roots[roots]
        n_comp = n_comp - n_added
        return roots, weight, in_mst, n_comp, n_added > 0

    def cond(c):
        roots, weight, in_mst, n_comp, progress = c
        return progress & (n_comp > 1)

    roots0 = jnp.arange(V, dtype=jnp.int32)
    state = (
        roots0,
        jnp.float32(0.0),
        jnp.zeros(E, dtype=bool),
        jnp.int32(V),
        jnp.bool_(True),
    )
    roots, weight, in_mst, n_comp, _ = jax.lax.while_loop(cond, body, state)
    return weight, in_mst, n_comp


def run(
    graph: Graph,
    require_connected: bool = False,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``mst::run`` (mst.hxx:287-311). Expects an
    undirected (symmetric) weighted edge set like the reference."""
    del options
    fn = jax.jit(mst_kernel)
    if warmup:
        jax.block_until_ready(fn(graph))
    t0 = time.perf_counter()
    weight, in_mst, n_comp = jax.block_until_ready(fn(graph))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    n_comp = int(n_comp)
    if require_connected and n_comp != 1:
        # Reference parity: mst.hxx:245-251 throws on no-progress rounds.
        raise RuntimeError(
            f"invalid graph: {n_comp} components remain (disconnected input)"
        )
    return Result(
        mst_weight=float(weight),
        mst_edges=in_mst,
        n_components=n_comp,
        elapsed_ms=elapsed_ms,
    )
