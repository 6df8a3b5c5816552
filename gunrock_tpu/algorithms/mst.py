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
import functools
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
    """Pure Borůvka over SYMMETRIC (two-copy) edge storage — the
    ``src < dst`` cut test inside selects one copy of each undirected
    edge. Directed graphs must go through :func:`run`, which
    canonicalizes the edge set first (feeding a directed CSR here
    silently drops every (u, v) edge with u > v and disconnects the
    graph). Returns (mst_weight, mst_edge_mask bool[E], n_components)."""
    return _mst_kernel_edges(
        graph.edge_src, graph.col_indices, graph.values,
        graph.n_vertices, max_rounds,
    )


def _canonical_edges(graph: Graph):
    """CSR -> canonical undirected edge list (host-side, cached per
    graph): each unordered pair once as (lo, hi) with the MINIMUM weight
    over its directed copies (the weight an MST would pick; scipy's
    minimum_spanning_tree applies the same semantics to an asymmetric
    matrix), self loops dropped. Also returns the CSR edge id of the
    kept copy so chosen edges map back to CSR ids.

    Used for SYMMETRIC storage too: the kernel's ``src < dst`` cut test
    makes half of a two-copy edge list statically dead, so feeding the
    canonical half costs half the E-sized gathers/scatters per round."""
    from gunrock_tpu.graph import hostcache
    from gunrock_tpu.ops.pallas.layout import cached_layout

    def build():
        s = hostcache.host(graph, "edge_src").astype(np.int64)
        d = hostcache.host(graph, "col_indices").astype(np.int64)
        w = hostcache.host(graph, "values")
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        keep_idx = np.flatnonzero(lo != hi)
        lo, hi, w = lo[keep_idx], hi[keep_idx], w[keep_idx]
        key = lo * graph.n_vertices + hi
        order = np.lexsort((w, key))
        key_s, w_s = key[order], w[order]
        first = np.ones(len(key_s), bool)
        first[1:] = key_s[1:] != key_s[:-1]
        key_u, w_u = key_s[first], w_s[first]
        orig_eid = keep_idx[order[first]].astype(np.int32)
        return (
            jnp.asarray((key_u // graph.n_vertices).astype(np.int32)),
            jnp.asarray((key_u % graph.n_vertices).astype(np.int32)),
            jnp.asarray(w_u.astype(np.float32)),
            jnp.asarray(orig_eid),
        )

    return cached_layout(graph.col_indices, build, ("mst_canonical",))


def _mst_kernel_edges(src, dst, w, V: int, max_rounds: int | None = None):
    """Borůvka core over explicit edge arrays (one undirected edge may
    appear as both copies — symmetric storage — or once canonically)."""
    E = src.shape[0]
    if E == 0:
        return (
            jnp.float32(0.0),
            jnp.zeros(0, dtype=bool),
            jnp.int32(V),
        )
    eid = jnp.arange(E, dtype=jnp.int32)
    del max_rounds  # the loop self-terminates on no-progress rounds

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
        # by pointer jumping (mst.hxx:211-224) before applying to vertices.
        # Early exit: hook chains are usually a handful deep — iterating
        # to the fixpoint beats the log2(V)-step fixed unroll (17 V-sized
        # gathers per round at scale 16; typical depth is ~3).
        new_roots = jnp.where(add, other_root, comp_ids)

        def jump_cond(c):
            _, changed = c
            return changed

        def jump_body(c):
            r, _ = c
            r2 = r[r]
            return r2, jnp.any(r2 != r)

        new_roots, _ = jax.lax.while_loop(
            jump_cond, jump_body, (new_roots, jnp.bool_(True))
        )
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


@functools.partial(jax.jit, static_argnames=("n_vertices", "e_csr"))
def _mst_canonical(s, d, w, orig, n_vertices: int, e_csr: int):
    """Borůvka over the canonical (half) edge list, chosen edges mapped
    back to a CSR-edge-id mask."""
    weight, in_c, n_comp = _mst_kernel_edges(s, d, w, n_vertices)
    Ec = in_c.shape[0]
    mask = (
        jnp.zeros(e_csr, bool)
        .at[jnp.where(in_c, orig, e_csr)]
        .set(True, mode="drop")
        if Ec
        else jnp.zeros(e_csr, bool)
    )
    return weight, mask, n_comp


def run(
    graph: Graph,
    require_connected: bool = False,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``mst::run`` (mst.hxx:287-311). Both symmetric
    and directed inputs run over the canonical undirected edge list (one
    copy per unordered pair, min weight over directed copies — half the
    per-round E-sized traffic of two-copy storage); ``mst_edges`` is a
    mask over CSR edge ids either way (the kept copy's id)."""
    del options
    cs, cd, cw, orig = _canonical_edges(graph)
    args = (cs, cd, cw, orig)
    kw = dict(n_vertices=graph.n_vertices, e_csr=graph.n_edges)
    if warmup:
        jax.block_until_ready(_mst_canonical(*args, **kw))
    t0 = time.perf_counter()
    weight, in_mst, n_comp = jax.block_until_ready(_mst_canonical(*args, **kw))
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
