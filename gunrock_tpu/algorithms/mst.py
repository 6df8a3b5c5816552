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


def _rank_tables_np(graph: Graph):
    """Canonical edges totally ordered by (weight, canonical id) — the
    order Borůvka's tie-break needs — as rank-indexed numpy tables
    (host, cached): rank r's edge has endpoints lo/hi
    ``s_of[r]/d_of[r]``, weight ``w_of[r]``, CSR id ``eid_of[r]``.
    Per-component choice then reduces to ONE int32 scatter-min of ranks
    (the packed (min weight, min id) pair of mst.hxx:130-174)."""
    from gunrock_tpu.ops.pallas.layout import cached_layout

    def build():
        cs, cd, cw, orig = _canonical_edges(graph)
        w = np.asarray(cw)
        order = np.lexsort((np.arange(w.size), w))
        return (
            np.asarray(cs)[order],
            np.asarray(cd)[order],
            w[order],
            np.asarray(orig)[order],
        )

    return cached_layout(graph.col_indices, build, ("mst_ranked_np",))


def _rank_tables(graph: Graph):
    """Device copies of :func:`_rank_tables_np` (cached)."""
    from gunrock_tpu.ops.pallas.layout import cached_layout

    def build():
        return tuple(jnp.asarray(a) for a in _rank_tables_np(graph))

    return cached_layout(graph.col_indices, build, ("mst_ranked",))


def _mst_rank_layout(graph: Graph, interpret: bool):
    """Bucketed layout of the DOUBLED canonical edge set with RANKS as
    values (+_BIG padding) — the input of the Pallas min-cut pass
    (ops/pallas/mst_min.py). Doubling makes every undirected edge
    visible from both endpoints' rows whatever the input's symmetry."""
    from gunrock_tpu.ops.pallas.layout import build_auto_layout, cached_layout
    from gunrock_tpu.ops.pallas.semiring import _BIG

    def build():
        s, d, _, _ = _rank_tables_np(graph)
        r = np.arange(s.size, dtype=np.float32)
        rows = np.concatenate([s, d])
        cols = np.concatenate([d, s])
        vals = np.concatenate([r, r])
        lay = build_auto_layout(
            rows, cols, vals, graph.n_vertices,
            pad_value=float(_BIG), interpret=interpret,
        )
        from gunrock_tpu.ops.pallas.layout import (
            BucketedEdges, _SMEM_BUDGET_CHUNKS, build_bucketed_layout,
            estimate_chunks,
        )

        if not isinstance(lay, BucketedEdges):
            # auto paged out (doubled edge set exceeds the SMEM chunk
            # budget at W=2048) — MST rounds are DENSE passes, where
            # W=4096/C=1024 measures best anyway (round-4
            # dense_window_chunk); retry there before giving up.
            if (
                estimate_chunks(rows, cols, graph.n_vertices, 4096, 1024)
                <= _SMEM_BUDGET_CHUNKS
            ):
                lay = build_bucketed_layout(
                    rows, cols, vals, graph.n_vertices,
                    window=4096, chunk=1024, pad_value=float(_BIG),
                )
        return lay

    return cached_layout(graph.col_indices, build, ("mst_rank_layout",))


@functools.partial(
    jax.jit, static_argnames=("V", "e_csr", "interpret")
)
def _mst_pallas(layout, s_of, d_of, w_of, eid_of, *, V: int, e_csr: int,
                interpret: bool):
    """Whole Borůvka as ONE while_loop executable; the per-round edge
    sweep is the bucketed dual-gather min-cut pass (~v5 dense-pass cost)
    instead of ~8 serialized E-sized gathers/scatters (round-4 weak #3:
    MST flat for two rounds). Per-round V-sized work: one scatter-min
    into component slots, rank-table lookups for the chosen edges,
    lo-side mutual dedup, hook + pointer jumping."""
    from gunrock_tpu.ops.pallas.mst_min import bucketed_min_rank_cut
    from gunrock_tpu.ops.pallas.semiring import _BIG

    BIGR = jnp.int32(2**30)
    comp = jnp.arange(V, dtype=jnp.int32)

    def body(c):
        roots, in_mst, w_acc, _ = c
        minrow = bucketed_min_rank_cut(
            layout, roots.astype(jnp.float32), interpret=interpret
        )
        minrow_i = jnp.where(minrow < _BIG, minrow, 2.0**30).astype(
            jnp.int32
        )
        minr = jnp.full(V, BIGR, jnp.int32).at[roots].min(minrow_i)
        has = minr < BIGR
        e = jnp.where(has, minr, 0)
        eu = s_of[e]  # lo endpoint of the chosen edge
        ev = d_of[e]
        ru_ = roots[eu]
        rv_ = roots[ev]
        from_lo = ru_ == comp
        target = jnp.where(from_lo, rv_, ru_)
        # mutual-pair dedup: the lo-endpoint's component survives
        add = has & (from_lo | (minr[jnp.clip(target, 0, V - 1)] != minr))
        w_acc = w_acc + jnp.sum(jnp.where(add, w_of[e], 0.0))
        n_added = jnp.sum(add.astype(jnp.int32))
        in_mst = in_mst.at[jnp.where(add, eid_of[e], e_csr)].set(
            True, mode="drop"
        )
        new_roots = jnp.where(add, target, comp)

        def jump_cond(c):
            return c[1]

        def jump_body(c):
            rr, _ = c
            r2 = rr[rr]
            return r2, jnp.any(r2 != rr)

        new_roots, _ = jax.lax.while_loop(
            jump_cond, jump_body, (new_roots, jnp.bool_(True))
        )
        roots = new_roots[roots]
        return roots, in_mst, w_acc, n_added

    def cond(c):
        return c[3] > 0

    roots, in_mst, w_acc, _ = jax.lax.while_loop(
        cond, body,
        (comp, jnp.zeros(e_csr, bool), jnp.float32(0.0), jnp.int32(1)),
    )
    n_comp = jnp.sum((roots == comp).astype(jnp.int32))
    return w_acc, in_mst, n_comp


@functools.partial(jax.jit, static_argnames=("Ek", "V", "final"))
def _mst_class_loop(s, d, r, roots, in_mst, w_acc, s_of, d_of, w_of,
                    eid_of, *, Ek: int, V: int, final: bool):
    """Contracting Borůvka rounds at ONE size class, entirely on device.

    ``(s, d)`` are current component endpoints (relabeled by prior
    rounds), ``r`` the global (weight, id) rank of each surviving edge;
    padding rides as s = d = V (a sentinel self-loop that is never cut).
    Per round (roles of mst.hxx:130-224): component min-rank via ONE
    int32 scatter-min per side (the rank packs the reference's (min
    weight, min id) pair — _rank_tables); chosen-edge lookups through
    V-sized rank tables; lo-side mutual-choice dedup; hook + pointer
    jumping; then edge RELABEL to component ids and stable-sort
    COMPACTION. Rounds repeat inside a ``lax.while_loop`` until either
    no component grows (done) or the live edge count drops under Ek/4 —
    then the HOST re-dispatches at a smaller class (geometric
    shrinkage; total edge work ~2E across all classes, vs rounds x E of
    the fixed-shape kernel — round-4 weak #3). Host syncs happen only
    at class boundaries (~log4 E of them), not per round: per-round
    scalar reads over the axon tunnel dominated the first cut of this
    redesign (s18 1.72 s vs the fixed kernel's 1.61 s)."""
    BIGR = jnp.int32(2**30)
    comp = jnp.arange(V, dtype=jnp.int32)
    from gunrock_tpu.ops.sort import lex_sort

    def body(c):
        s, d, r, roots, in_mst, w_acc, n_added_prev, m = c
        rs = roots[s]
        rd = roots[d]
        cut = rs != rd
        cand = jnp.where(cut, r, BIGR)
        minr = jnp.full(V + 1, BIGR, jnp.int32)
        minr = minr.at[rs].min(cand)
        minr = minr.at[rd].min(cand)
        minr = minr[:V]
        has = minr < BIGR
        e = jnp.where(has, minr, 0)
        eu = s_of[e]  # lo endpoint (original vertex space)
        ev = d_of[e]
        ru_ = roots[eu]
        rv_ = roots[ev]
        from_lo = ru_ == comp
        target = jnp.where(from_lo, rv_, ru_)
        # mutual-pair dedup: the lo-endpoint's component survives
        add = has & (from_lo | (minr[jnp.clip(target, 0, V - 1)] != minr))
        w_acc = w_acc + jnp.sum(jnp.where(add, w_of[e], 0.0))
        n_added = jnp.sum(add.astype(jnp.int32))
        in_mst = in_mst.at[
            jnp.where(add, eid_of[e], in_mst.shape[0])
        ].set(True, mode="drop")
        new_roots = jnp.where(add, target, comp)

        def jump_cond(c):
            return c[1]

        def jump_body(c):
            rr, _ = c
            r2 = rr[rr]
            return r2, jnp.any(r2 != rr)

        new_roots, _ = jax.lax.while_loop(
            jump_cond, jump_body, (new_roots, jnp.bool_(True))
        )
        roots = jnp.concatenate(
            [new_roots[roots[:V]], jnp.full(1, V, jnp.int32)]
        )
        # relabel edges to new component ids; dead edges to the sentinel
        s2 = roots[rs]
        d2 = roots[rd]
        alive = s2 != d2
        s2 = jnp.where(alive, s2, V)
        d2 = jnp.where(alive, d2, V)
        m_new = jnp.sum(alive.astype(jnp.int32))
        key = (~alive).astype(jnp.int32)
        _, s2, d2, r = lex_sort((key, s2, d2, r), num_keys=1,
                                two_pass=False)
        return s2, d2, r, roots, in_mst, w_acc, n_added, m_new

    def cond(c):
        n_added, m = c[6], c[7]
        keep = n_added > 0
        if not final:
            keep = keep & (m > Ek // 4)
        return keep

    state = (s, d, r, roots, in_mst, w_acc, jnp.int32(1),
             jnp.int32(Ek))
    s, d, r, roots, in_mst, w_acc, n_added, m = jax.lax.while_loop(
        cond, body, state
    )
    return s, d, r, roots, in_mst, w_acc, n_added, m


_MST_CLASS_MIN = 1 << 14


def _size_class(m: int) -> int:
    """Power-of-4 padding ladder: one compiled round executable per
    class, shared across graphs and rounds."""
    c = _MST_CLASS_MIN
    while c < m:
        c <<= 2
    return c


@functools.partial(jax.jit, static_argnames=("V",))
def _count_components(roots, V: int):
    return jnp.sum(
        (roots[:V] == jnp.arange(V, dtype=jnp.int32)).astype(jnp.int32)
    )


def _mst_contract(graph: Graph):
    """Host-driven class ladder around :func:`_mst_class_loop` (the
    round-5 default). Returns (weight, in_mst bool[E_csr],
    n_components)."""
    V = graph.n_vertices
    s_of, d_of, w_of, eid_of = _rank_tables(graph)
    Ec = int(s_of.shape[0])
    if Ec == 0:
        return 0.0, jnp.zeros(graph.n_edges, bool), V
    Ek = _size_class(Ec)
    pad = Ek - Ec
    s = jnp.concatenate([s_of, jnp.full(pad, V, jnp.int32)])
    d = jnp.concatenate([d_of, jnp.full(pad, V, jnp.int32)])
    r = jnp.concatenate(
        [jnp.arange(Ec, dtype=jnp.int32), jnp.full(pad, 2**30, jnp.int32)]
    )
    roots = jnp.concatenate(
        [jnp.arange(V, dtype=jnp.int32), jnp.full(1, V, jnp.int32)]
    )
    in_mst = jnp.zeros(graph.n_edges, bool)
    w_acc = jnp.float32(0.0)
    while True:
        final = Ek <= _MST_CLASS_MIN
        s, d, r, roots, in_mst, w_acc, n_added, m = _mst_class_loop(
            s, d, r, roots, in_mst, w_acc, s_of, d_of, w_of, eid_of,
            Ek=Ek, V=V, final=final,
        )
        # one host sync per CLASS (not per round)
        n_added, m = int(n_added), int(m)
        if n_added == 0 or m == 0:
            break
        nk = _size_class(m)
        if nk < Ek:
            s, d, r = s[:nk], d[:nk], r[:nk]
            Ek = nk
    n_comp = int(_count_components(roots, V=V))
    return float(w_acc), in_mst, n_comp


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
    strategy: str = "auto",
) -> Result:
    """Role of reference ``mst::run`` (mst.hxx:287-311). Both symmetric
    and directed inputs run over the canonical undirected edge list (one
    copy per unordered pair, min weight over directed copies — half the
    per-round E-sized traffic of two-copy storage); ``mst_edges`` is a
    mask over CSR edge ids either way (the kept copy's id).

    ``strategy='auto'`` (default) resolves to ``'pallas'`` — the whole
    Borůvka loop as one executable whose per-round edge sweep is the
    bucketed dual-gather min-cut kernel (ops/pallas/mst_min.py) — when
    ranks fit f32 exactly (E_canonical < 2^24) and the layout is
    SMEM-resident; otherwise ``'loop'``. ``'contract'``: host-driven
    class ladder with edge relabeling + compaction (wins only on
    graphs whose live-edge count decays gradually — power-law R-MAT
    collapses too late for it, measured round 5). ``'loop'``: the
    round-2 single-executable ``lax.while_loop`` kernel (fixed E-sized
    gathers every round; building block of the sharded layer)."""
    del options
    if strategy == "auto":
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import BucketedEdges

        interpret = use_interpret()
        lay = None
        s_np, _, _, _ = _rank_tables_np(graph)
        if s_np.size and s_np.size < (1 << 24):
            lay = _mst_rank_layout(graph, interpret)
        strategy = (
            "pallas" if isinstance(lay, BucketedEdges) else "loop"
        )
    if strategy == "pallas":
        from gunrock_tpu.ops.pallas import use_interpret

        interpret = use_interpret()
        lay = _mst_rank_layout(graph, interpret)
        s_of, d_of, w_of, eid_of = _rank_tables(graph)
        kw = dict(V=graph.n_vertices, e_csr=graph.n_edges,
                  interpret=interpret)
        if warmup:
            jax.block_until_ready(
                _mst_pallas(lay, s_of, d_of, w_of, eid_of, **kw)
            )
        t0 = time.perf_counter()
        weight, in_mst, n_comp = jax.block_until_ready(
            _mst_pallas(lay, s_of, d_of, w_of, eid_of, **kw)
        )
        elapsed_ms = (time.perf_counter() - t0) * 1e3
    elif strategy == "contract":
        if warmup:
            _mst_contract(graph)
        t0 = time.perf_counter()
        weight, in_mst, n_comp = _mst_contract(graph)
        in_mst = jax.block_until_ready(in_mst)
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        weight = jnp.float32(weight)
    else:
        cs, cd, cw, orig = _canonical_edges(graph)
        args = (cs, cd, cw, orig)
        kw = dict(n_vertices=graph.n_vertices, e_csr=graph.n_edges)
        if warmup:
            jax.block_until_ready(_mst_canonical(*args, **kw))
        t0 = time.perf_counter()
        weight, in_mst, n_comp = jax.block_until_ready(
            _mst_canonical(*args, **kw)
        )
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
