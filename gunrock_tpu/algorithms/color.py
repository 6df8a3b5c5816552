"""Graph coloring via parallel independent sets (Luby/Jones-Plassmann).

Role of reference include/gunrock/algorithms/color.hxx — a *filter-only*
loop over the all-vertices frontier: per iteration, an uncolored vertex
takes color ``2*it`` if its random number beats every relevant neighbor's
(max), or ``2*it + 1`` if it is beaten by all (min) — two colors per
iteration (color.hxx:102-149). Randoms are drawn once in reset
(color.hxx:67).

TPU redesign: the per-vertex neighbor scan becomes two segmented reductions
(max/min of uncolored neighbors' randoms over the CSR edge order); the
whole loop is a ``lax.while_loop`` over the dense uncolored mask. Randoms
are a random *permutation* of [0, V) — unique by construction, so the
reference's id tie-breaking (color.hxx:132-136) never fires and the
independent-set argument is exact.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import hostcache

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options

INVALID_COLOR = jnp.int32(-1)


@dataclasses.dataclass
class Param:
    seed: int = 0
    ordering: str = "random"  # "random" (reference parity) | "degree" (JP-LDF)


@dataclasses.dataclass
class Result:
    colors: jax.Array  # int32[V]
    iterations: int
    elapsed_ms: float


def make_priorities(graph: Graph, seed: int, ordering: str = "random"):
    """Unique per-vertex priorities. "random" = a permutation of [0, V)
    (the reference's uniform randoms, color.hxx:67). "degree" =
    Jones-Plassmann largest-degree-first: priorities are the ranks of a
    stable sort by (degree, tiebreak) — high-degree vertices win their
    neighborhoods early, which empirically cuts colors and rounds on
    power-law graphs. Unique integers < V stay exact in f32 up to 2^24."""
    V = graph.n_vertices
    perm = jax.random.permutation(jax.random.PRNGKey(seed), V).astype(jnp.int32)
    if ordering == "random":
        return perm
    if ordering == "degree":
        deg = jnp.diff(graph.row_offsets)
        # rank by (deg, perm): vertex with rank r gets priority r
        order = jnp.lexsort((perm, deg))  # ascending; highest deg = rank V-1
        return jnp.zeros(V, jnp.int32).at[order].set(
            jnp.arange(V, dtype=jnp.int32)
        )
    raise ValueError(f"unknown ordering {ordering!r}")


def color_step(graph: Graph, colors, randoms, iteration):
    """One coloring round (pure). Two new colors: 2*it and 2*it + 1.

    On directed graphs the neighbor scans cover BOTH out- and in-edges:
    an edge (u, v) seen only from u's side lets u and v color the same
    round with the same color (the reference scans out-edges only,
    color.hxx:116-140, and is silently improper on directed inputs —
    deviation: we color the underlying undirected graph)."""
    V = graph.n_vertices
    uncolored = colors == INVALID_COLOR
    src, dst = graph.edge_src, graph.col_indices
    # Relevant neighbors: uncolored, not a self loop (color.hxx:126-130).
    relevant = uncolored[dst] & (src != dst)
    nbr_rand = jnp.where(relevant, randoms[dst], -1)
    nbr_max = jax.ops.segment_max(
        nbr_rand, src, num_segments=V, indices_are_sorted=True
    )
    big = V + 1
    nbr_min = jax.ops.segment_min(
        jnp.where(relevant, randoms[dst], big),
        src,
        num_segments=V,
        indices_are_sorted=True,
    )
    if not graph.properties.symmetric:
        crow, cdst = graph.csc_rows, graph.csc_dst
        rel_in = uncolored[crow] & (crow != cdst)
        nbr_max = jnp.maximum(
            nbr_max,
            jax.ops.segment_max(
                jnp.where(rel_in, randoms[crow], -1), cdst,
                num_segments=V, indices_are_sorted=True,
            ),
        )
        nbr_min = jnp.minimum(
            nbr_min,
            jax.ops.segment_min(
                jnp.where(rel_in, randoms[crow], big), cdst,
                num_segments=V, indices_are_sorted=True,
            ),
        )
    has_nbr = nbr_max >= 0
    colormax = uncolored & (randoms > nbr_max)
    colormin = uncolored & has_nbr & (randoms < nbr_min) & ~colormax
    color = iteration * 2
    colors = jnp.where(colormax, color, colors)
    colors = jnp.where(colormin, color + 1, colors)
    return colors


def color_kernel_rank(
    graph: Graph,
    seed: int = 0,
    max_iterations: int | None = None,
    ordering: str = "random",
    rank_cap: int = 32,
):
    """Rank-based multi-color Jones-Plassmann (no reference counterpart —
    a TPU round-count optimization; the reference's Luby max+min loop
    assigns exactly 2 colors per round, color.hxx:102-149).

    Per round every uncolored vertex computes ``rank`` = number of
    *higher-priority uncolored* neighbors (clamped to ``rank_cap - 1``)
    and colors itself ``base + remap[rank]`` when its rank strictly
    exceeds the ranks of all its higher-priority uncolored neighbors, or
    ties are broken by priority. Properness: two adjacent vertices can
    only color in the same round with different ranks (strict-dominance
    chain) or by winning the priority tie-break against each other —
    both give distinct colors; ``base`` advances past the colors used
    each round, separating rounds.

    Measured (numpy sim, rmat14 ef16): 39 rounds / 416 colors at cap 32
    vs 154 rounds / 307 colors for Luby max+min — ~4x fewer rounds for
    ~1.35x more colors. Returns (colors, iterations)."""
    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    prio = make_priorities(graph, seed, ordering)
    colors0 = jnp.full(V, INVALID_COLOR, dtype=jnp.int32)
    R = rank_cap

    src, dst = graph.edge_src, graph.col_indices
    if not graph.properties.symmetric:
        # underlying undirected graph (same deviation as color_step)
        src = jnp.concatenate([src, graph.csc_dst])
        dst = jnp.concatenate([dst, graph.csc_rows])
    not_loop = src != dst
    # src is CSR-sorted only when no CSC mirror was concatenated
    sorted_src = bool(graph.properties.symmetric)

    def seg_sum(vals):
        return jax.ops.segment_sum(
            vals, src, num_segments=V, indices_are_sorted=sorted_src
        )

    def seg_max(vals, init):
        return jnp.maximum(
            jax.ops.segment_max(
                vals, src, num_segments=V, indices_are_sorted=sorted_src
            ),
            init,
        )

    def cond(c):
        it, base, colors = c
        return jnp.any(colors == INVALID_COLOR) & (it < max_it)

    def body(c):
        it, base, colors = c
        unc = colors == INVALID_COLOR
        higher = unc[dst] & (prio[dst] > prio[src]) & not_loop
        rank = jnp.minimum(
            seg_sum(jnp.where(higher & unc[src], 1, 0)), R - 1
        ).astype(jnp.int32)
        mr = seg_max(jnp.where(higher, rank[dst], -1), -1)
        mr = jnp.where(unc, mr, V + 10)
        # strict dominance alone is sound AND live: two adjacent
        # same-rank vertices can never both pass (the higher-priority one
        # bounds the other's mr), and the global max-priority uncolored
        # vertex always passes (mr = -1). A priority tie-break on
        # rank == mr is provably dead: the rank-maximizing neighbor has
        # strictly greater priority, so prio > mp can never hold.
        col_now = unc & (rank > mr)
        # compact: only burn the distinct ranks actually used this round
        used = (
            jnp.zeros(R, jnp.int32)
            .at[jnp.where(col_now, rank, R)]
            .max(jnp.ones_like(rank), mode="drop")
        )
        remap = jnp.cumsum(used) - used
        colors = jnp.where(col_now, base + remap[rank], colors)
        return it + 1, base + jnp.sum(used), colors

    it, _, colors = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), colors0)
    )
    return colors, it


def color_kernel(graph: Graph, seed: int = 0, max_iterations: int | None = None,
                 ordering: str = "random"):
    """Pure coloring. Returns (colors, iterations)."""
    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    randoms = make_priorities(graph, seed, ordering)
    colors0 = jnp.full(V, INVALID_COLOR, dtype=jnp.int32)

    def cond(carry):
        it, colors = carry
        return jnp.any(colors == INVALID_COLOR) & (it < max_it)

    def body(carry):
        it, colors = carry
        return it + 1, color_step(graph, colors, randoms, it)

    it, colors = jax.lax.while_loop(cond, body, (jnp.int32(0), colors0))
    return colors, it


def _color_layout(graph: Graph, interpret: bool):
    """Self-loop-free push layout for the Pallas coloring scans; directed
    graphs get the symmetrized (undirected) edge set so properness holds
    on the underlying undirected graph."""
    import numpy as np

    from gunrock_tpu.ops.pallas.layout import build_auto_layout, cached_layout

    def build():
        src = hostcache.host(graph, "edge_src")
        dst = hostcache.host(graph, "col_indices")
        if not graph.properties.symmetric:
            src, dst = (
                np.concatenate([src, dst]),
                np.concatenate([dst, src]),
            )
        keep = src != dst  # drop self loops (color.hxx:126-130)
        return build_auto_layout(
            src[keep], dst[keep], np.ones(int(keep.sum()), np.float32),
            graph.n_vertices, interpret=interpret,
        )

    return cached_layout(
        graph.col_indices, build, ("color_sym", "auto", interpret)
    )


def _rank_color_layout(graph: Graph, interpret: bool):
    """Self-loop-free symmetrized push layout whose edge VALUES encode the
    static higher-priority predicate: w[(v,u)] = 1 iff neighbor u
    outranks v (u's id is smaller — rank-JP priorities are the inverse
    vertex-id order, so a degree-sorted graph gets LDF priorities for
    free). Baking the predicate into the layout is what lets rank-JP run
    on the unmodified sparse semiring kernels."""
    import numpy as np

    from gunrock_tpu.ops.pallas.layout import build_auto_layout, cached_layout

    def build():
        src = hostcache.host(graph, "edge_src")
        dst = hostcache.host(graph, "col_indices")
        if not graph.properties.symmetric:
            src, dst = (
                np.concatenate([src, dst]),
                np.concatenate([dst, src]),
            )
        keep = src != dst
        src, dst = src[keep], dst[keep]
        higher = (dst < src).astype(np.float32)
        return build_auto_layout(
            src, dst, higher, graph.n_vertices, interpret=interpret,
        )

    return cached_layout(
        graph.col_indices, build, ("color_rank", "auto", interpret)
    )


def color_kernel_rank_pallas(
    graph: Graph,
    max_iterations: int | None = None,
    layout=None,
    interpret: bool | None = None,
    rank_cap: int = 32,
):
    """Rank-based multi-color JP on the frontier-sparse Pallas kernels
    (see color_kernel_rank for the algorithm and properness argument).

    TPU form: priorities are the inverse vertex-id order, which makes the
    per-edge "neighbor outranks me" predicate STATIC — baked into the
    layout values — so each round is exactly two sparse semiring passes:

      rank[v] = plus_times(unc, w=higher)        # count of higher unc nbrs
      mq[v]   = max_times(pack(rankc, inv_id), w=higher)

    where pack = rankc * MULT + inv_id + 1 is a lexicographic (rank,
    priority) key that unifies strict rank dominance and the priority
    tie-break in ONE max reduction: v colors iff pack[v] > mq[v]. pack
    stays exact in f32 (≤ 2^24): ids are pre-shifted so inv_id fits 18
    bits; beyond scale 18 adjacent ids may tie, which only delays those
    vertices (the minimum-id uncolored vertex always has mq = 0 and
    colors, so every round makes progress). Both passes are doubly
    frontier-sparse: source AND destination windows with no uncolored
    vertex are skipped, so late rounds cost ~nothing.

    Deterministic (no seed): the priority IS the vertex order. Returns
    (colors, iterations)."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv_sparse

    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    if interpret is None:
        interpret = use_interpret()
    if layout is None:
        layout = _rank_color_layout(graph, interpret)
    R = rank_cap
    v_bits = max(1, (V - 1).bit_length())
    shift = max(0, v_bits - 18)
    inv1 = ((jnp.int32(V - 1) - jnp.arange(V, dtype=jnp.int32)) >> shift) + 1
    MULT = jnp.int32(((V - 1) >> shift) + 2)
    colors0 = jnp.full(V, INVALID_COLOR, dtype=jnp.int32)

    def cond(c):
        it, base, colors = c
        return jnp.any(colors == INVALID_COLOR) & (it < max_it)

    def body(c):
        it, base, colors = c
        unc = colors == INVALID_COLOR
        rank = bucketed_semiring_spmv_sparse(
            layout, unc.astype(jnp.float32), unc, "plus_times",
            interpret=interpret, out_mask=unc, tail_grids=(2, 4, 8, 64),
        )
        rankc = jnp.minimum(rank, R - 1).astype(jnp.int32)
        pack = (rankc * MULT + inv1).astype(jnp.float32)
        mq = bucketed_semiring_spmv_sparse(
            layout, jnp.where(unc, pack, 0.0), unc, "max_times",
            interpret=interpret, out_mask=unc, tail_grids=(2, 4, 8, 64),
        )
        col_now = unc & (pack > mq)
        used = (
            jnp.zeros(R, jnp.int32)
            .at[jnp.where(col_now, rankc, R)]
            .max(jnp.ones_like(rankc), mode="drop")
        )
        remap = jnp.cumsum(used) - used
        colors = jnp.where(col_now, base + remap[rankc], colors)
        return it + 1, base + jnp.sum(used), colors

    it, _, colors = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), colors0)
    )
    return colors, it


def _greedy_color_setup(graph: Graph, interpret: bool):
    """(layout, rank) for spec-greedy coloring: the higher-priority-valued
    symmetrized layout (shared with rank-JP, see _rank_color_layout) plus
    the STATIC per-vertex outranking-degree rank[v] = #{u ~ v : u < v},
    host-computed once per graph (priorities are the inverse vertex-id
    order, so rank is a property of the labeling, not of the run)."""
    import numpy as np

    from gunrock_tpu.ops.pallas.layout import cached_layout

    layout = _rank_color_layout(graph, interpret)

    def build_rank():
        src = hostcache.host(graph, "edge_src")
        dst = hostcache.host(graph, "col_indices")
        if not graph.properties.symmetric:
            src, dst = (
                np.concatenate([src, dst]),
                np.concatenate([dst, src]),
            )
        higher = (dst < src) & (src != dst)
        return jnp.asarray(
            np.bincount(src[higher], minlength=graph.n_vertices).astype(
                np.int32
            )
        )

    rank = cached_layout(graph.col_indices, build_rank, ("color_greedy_rank",))
    return layout, rank


def color_kernel_greedy_pallas(
    graph: Graph,
    rank: jax.Array | None = None,
    max_iterations: int | None = None,
    layout=None,
    interpret: bool | None = None,
    K: int = 32,
    phase_spread: bool = True,
):
    """Speculative greedy (windowed-mex) coloring — the TPU analog of
    ECL-GC-style speculate-and-repair, with no reference counterpart
    (the reference's Luby loop burns 2 colors/round, color.hxx:102-149).

    Per round ONE frontier-sparse plus_times SpMM pass maintains
    ``cnt[v, k]`` = #outranking neighbors of v with color base+k (the
    ``higher`` predicate is baked into the layout values, as in rank-JP):
    the pass input is the signed one-hot DELTA of vertices whose color
    changed last round, accumulated into the carried cnt — so per-round
    cost tracks the change set, which collapses geometrically. Every
    unstable vertex then takes the mex (first k with cnt==0); a colored
    vertex whose own slot went positive is in conflict and immediately
    re-takes the mex (its old slot is >0, so it never re-picks it). The
    highest-priority vertex of any conflict never moves, so stability is
    reached in <= longest-path rounds (measured: 73 rounds at s18 vs
    rank-JP's 57, but ~11 full-pass equivalents vs 114, and 128 colors
    vs 831 — benchmarks/sim_color_greedy.py).

    Colors live in windows of K: when a phase stalls with uncolored
    (window-saturated) vertices, base advances by K, cnt resets to zero,
    and (``phase_spread``) the residual dense core seeds the new window
    at rank % K instead of thundering onto one color.

    Deterministic (priority = inverse vertex id; relabel the graph to
    change it). Requires V < 2^24 (cnt counts ride exact f32).
    Returns (colors, iterations)."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm_sparse

    V = graph.n_vertices
    max_it = 4 * V if max_iterations is None else max_iterations
    if interpret is None:
        interpret = use_interpret()
    if layout is None or rank is None:
        # derive only the missing piece (a caller-supplied rank must
        # never be silently replaced); host-side — call outside jit
        d_layout, d_rank = _greedy_color_setup(graph, interpret)
        layout = d_layout if layout is None else layout
        rank = d_rank if rank is None else rank
    lanes_k = jnp.arange(K, dtype=jnp.int32)[None, :]

    colors0 = jnp.minimum(rank, K - 1)  # rank-init tentative coloring
    old0 = jnp.full(V, INVALID_COLOR, jnp.int32)
    changed0 = jnp.ones(V, bool)
    cnt0 = jnp.zeros((V, K), jnp.float32)

    def onehot_inwin(cols, base, mask):
        inwin = (cols >= base) & (cols < base + K)
        koff = jnp.clip(cols - base, 0, K - 1)
        return ((koff[:, None] == lanes_k) & (inwin & mask)[:, None]).astype(
            jnp.float32
        ), inwin

    def cond(c):
        it, base, colors, old, changed, cnt = c
        return (
            jnp.any(changed) | jnp.any(colors == INVALID_COLOR)
        ) & (it < max_it)

    def body(c):
        it, base, colors, old, changed, cnt = c
        unc = colors == INVALID_COLOR
        oh_new, inwin = onehot_inwin(colors, base, changed)
        oh_old, _ = onehot_inwin(old, base, changed)
        x = oh_new - oh_old  # signed one-hot delta, bf16-exact
        unstable = unc | inwin
        # tail grids: the change set collapses geometrically over ~70+
        # rounds, so late rounds run the /8 or /64 grid instead of
        # iterating every predicated-off chunk slot
        cnt = cnt + bucketed_spmm_sparse(
            layout, x, changed, interpret=interpret, out_mask=unstable,
            exact=True, tail_grids=(2, 4, 8, 64),
        )
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
        new_colors = jnp.where(conflict, INVALID_COLOR, colors)
        new_colors = jnp.where(take, base + mex, new_colors)
        changed_new = new_colors != colors
        unc2 = new_colors == INVALID_COLOR
        stall = ~jnp.any(changed_new) & jnp.any(unc2)
        base_next = base + jnp.where(stall, K, 0)
        if phase_spread:
            seed = base_next + rank % K
            colors_next = jnp.where(stall & unc2, seed, new_colors)
            changed_next = jnp.where(stall, unc2, changed_new)
        else:
            colors_next = new_colors
            changed_next = jnp.where(stall, False, changed_new)
        cnt_next = jnp.where(stall, 0.0, cnt)
        return it + 1, base_next, colors_next, colors, changed_next, cnt_next

    it, _, colors, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), colors0, old0, changed0, cnt0)
    )
    return colors, it


def color_kernel_greedy(
    graph: Graph,
    max_iterations: int | None = None,
    K: int = 32,
    phase_spread: bool = True,
):
    """XLA reference body for spec-greedy coloring (same update rules as
    color_kernel_greedy_pallas, cnt recomputed per round via scatter-add
    — the oracle path for CPU tests and non-Pallas options). Jittable:
    the outranking predicate masks scatter weights instead of compacting
    the edge list. Returns (colors, iterations)."""
    V = graph.n_vertices
    max_it = 4 * V if max_iterations is None else max_iterations
    hsrc, hdst = graph.edge_src, graph.col_indices
    if not graph.properties.symmetric:
        hsrc = jnp.concatenate([hsrc, graph.csc_dst])
        hdst = jnp.concatenate([hdst, graph.csc_rows])
    higher = (hdst < hsrc) & (hsrc != hdst)
    rank = jax.ops.segment_sum(
        higher.astype(jnp.int32), hsrc, num_segments=V
    )
    lanes_k = jnp.arange(K, dtype=jnp.int32)[None, :]
    colors0 = jnp.minimum(rank, K - 1)

    def cond(c):
        it, base, colors, changed = c
        return (changed | jnp.any(colors == INVALID_COLOR)) & (it < max_it)

    def body(c):
        it, base, colors, _ = c
        unc = colors == INVALID_COLOR
        nc = colors[hdst]
        n_inwin = (nc >= base) & (nc < base + K)
        cnt = (
            jnp.zeros((V, K), jnp.int32)
            .at[hsrc, jnp.clip(nc - base, 0, K - 1)]
            .add((n_inwin & higher).astype(jnp.int32))
        )
        inwin = (colors >= base) & (colors < base + K)
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
        new_colors = jnp.where(conflict, INVALID_COLOR, colors)
        new_colors = jnp.where(take, base + mex, new_colors)
        any_changed = jnp.any(new_colors != colors)
        unc2 = new_colors == INVALID_COLOR
        stall = ~any_changed & jnp.any(unc2)
        base_next = base + jnp.where(stall, K, 0)
        if phase_spread:
            seed = base_next + rank % K
            colors_next = jnp.where(stall & unc2, seed, new_colors)
            changed_next = any_changed | stall
        else:
            colors_next = new_colors
            changed_next = any_changed
        return it + 1, base_next, colors_next, changed_next

    it, _, colors, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), colors0, jnp.bool_(True))
    )
    return colors, it


def color_kernel_pallas(
    graph: Graph,
    seed: int = 0,
    max_iterations: int | None = None,
    layout=None,
    interpret: bool | None = None,
    ordering: str = "random",
):
    """Coloring with the max-times Pallas semiring: the two neighbor
    scans become bucketed windowed-one-hot max reductions over a
    self-loop-free push layout. Priorities are fed shifted by +1 so the
    semiring identity 0 always means "no uncolored neighbor": without the
    shift a priority-0 vertex with no uncolored neighbors can never pass
    the strict colormax compare (0 > 0) and the loop spins to max_it.

    The two neighbor scans (max and min of uncolored priorities) are ONE
    fused kernel pass: the [C, W] windowed one-hot compare — the dominant
    VPU cost — is paid once and feeds both reductions. The pass is also
    doubly frontier-sparse: only uncolored vertices feed priorities in
    (source windows with no uncolored vertex skip) and only uncolored
    vertices read their scan result (destination windows with no
    uncolored vertex skip)."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.semiring import (
        _BIG,
        bucketed_semiring_spmv_sparse_minmax,
    )

    V = graph.n_vertices
    max_it = V if max_iterations is None else max_iterations
    if interpret is None:
        interpret = use_interpret()
    if layout is None:
        layout = _color_layout(graph, interpret)
    randoms = make_priorities(graph, seed, ordering)
    # +1 shift: uncolored vertices present priorities in [1, V], so the
    # max-times identity 0 is unambiguous "no uncolored neighbor".
    randf = randoms.astype(jnp.float32) + 1.0
    colors0 = jnp.full(V, INVALID_COLOR, dtype=jnp.int32)

    def cond(c):
        it, colors = c
        return jnp.any(colors == INVALID_COLOR) & (it < max_it)

    def body(c):
        it, colors = c
        uncolored = colors == INVALID_COLOR
        x_max = jnp.where(uncolored, randf, 0.0)
        nbr_max, nbr_min = bucketed_semiring_spmv_sparse_minmax(
            layout, x_max, uncolored, interpret=interpret,
            out_mask=uncolored, tail_grids=(2, 4, 8, 64),
        )
        has_nbr = nbr_min < _BIG
        colormax = uncolored & (randf > nbr_max)
        colormin = uncolored & has_nbr & (randf < nbr_min) & ~colormax
        color = it * 2
        colors = jnp.where(colormax, color, colors)
        colors = jnp.where(colormin, color + 1, colors)
        return it + 1, colors

    it, colors = jax.lax.while_loop(cond, body, (jnp.int32(0), colors0))
    return colors, it


@functools.lru_cache(maxsize=None)
def _run_fn(kind: str, seed: int, ordering: str, interpret: bool):
    """One hot jitted executable per configuration (see run())."""
    if kind == "greedy_pallas":
        return jax.jit(
            lambda g, lay, rank: color_kernel_greedy_pallas(
                g, rank, layout=lay, interpret=interpret
            )
        )
    if kind == "greedy_xla":
        return jax.jit(lambda g, lay, rank: color_kernel_greedy(g))
    if kind == "rank_pallas":
        return jax.jit(
            lambda g, lay: color_kernel_rank_pallas(
                g, layout=lay, interpret=interpret
            )
        )
    if kind == "rank_xla":
        return jax.jit(
            lambda g, lay: color_kernel_rank(g, seed=seed, ordering=ordering)
        )
    if kind == "luby_pallas":
        return jax.jit(
            lambda g, lay: color_kernel_pallas(
                g, seed=seed, layout=lay, interpret=interpret,
                ordering=ordering,
            )
        )
    return jax.jit(
        lambda g, lay: color_kernel(g, seed=seed, ordering=ordering)
    )


def run(
    graph: Graph,
    seed: int = 0,
    options: Options | None = None,
    warmup: bool = True,
    ordering: str = "random",
    strategy: str = "auto",
) -> Result:
    """Role of reference ``color::run`` (color.hxx:167-186).

    ``strategy``: "auto" (default — resolves to "greedy" on the Pallas
    path, the measured Pareto winner on chip: s18 degsort 3.12 s/128
    colors vs rank 4.66 s/1176 and Luby 23.2 s/929; resolves to "luby"
    on the XLA path for reference parity), "luby" (reference parity —
    2 colors/round via max+min independent sets), "rank" (multi-color
    rank JP: ~4x fewer rounds for ~1.35x more colors; see
    color_kernel_rank), or "greedy" (speculative windowed-mex greedy:
    ~10x fewer heavy passes AND ~6-8x fewer colors than rank; see
    color_kernel_greedy_pallas). NOTE: the Pallas rank/greedy paths bake
    static inverse-vertex-id priorities into the layout (that staticness
    IS the speedup) — they therefore ignore ``seed`` and ``ordering``;
    relabel the graph (graph/reorder.py) to change them."""
    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    pallas = options.load_balance == LoadBalance.PALLAS_MERGE_PATH
    if strategy == "auto":
        strategy = "greedy" if pallas else "luby"
    rank = None
    if pallas:
        from gunrock_tpu.ops.pallas import use_interpret

        interpret = use_interpret()
        if strategy == "greedy":
            layout, rank = _greedy_color_setup(graph, interpret)
        elif strategy == "rank":
            layout = _rank_color_layout(graph, interpret)
        else:
            layout = _color_layout(graph, interpret)
    else:
        interpret = False
        layout = None
    if strategy not in ("luby", "rank", "greedy"):
        raise ValueError(f"unknown coloring strategy {strategy!r}")
    kind = strategy + ("_pallas" if pallas else "_xla")
    # jitted executables cached per (kind, seed, ordering, interpret) —
    # a fresh jit(lambda) per call would recompile every run (~90 s over
    # the axon tunnel); layout stays a jit ARGUMENT (a closure would
    # bake it into the HLO, overflowing the remote-compile payload)
    fn = _run_fn(kind, seed, ordering, interpret)
    args = (graph, layout) + ((rank,) if strategy == "greedy" else ())
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    colors, it = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return Result(colors=colors, iterations=int(it), elapsed_ms=elapsed_ms)
