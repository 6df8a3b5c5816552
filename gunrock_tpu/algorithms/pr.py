"""PageRank (weighted power iteration with dangling-mass correction).

Role of reference include/gunrock/algorithms/pr.hxx — frontier-less dense
iteration (SURVEY.md section 3.3):

- ``iweights[v] = alpha / sum_out_weights(v)`` (0 for dangling vertices),
  precomputed in reset (pr.hxx:78-92),
- per iteration: ``plast = p``; ``dsum = sum over dangling v of
  alpha * plast[v]`` (pr.hxx:125-132); ``p = (1 - alpha + dsum) / n``
  everywhere (pr.hxx:134); then scatter ``plast[src]*iweights[src]*w``
  into ``p[dst]`` over every edge (pr.hxx:140-152),
- converge when ``max|p - plast| < tol``, checked from iteration 1
  (pr.hxx:172-195).

TPU redesign: the atomicAdd edge scatter becomes one sorted segment-sum
over the CSC ordering (deterministic SpMV); the whole power iteration is a
``lax.while_loop`` with the L-inf error computed on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gunrock_tpu.graph import hostcache

from gunrock_tpu.framework.enactor import Enactor
from gunrock_tpu.framework.problem import Problem
from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


@dataclasses.dataclass
class Param:
    alpha: float = 0.85
    tol: float = 1e-6


@dataclasses.dataclass
class Result:
    p: jax.Array  # float32[V]
    iterations: int
    elapsed_ms: float


@dataclasses.dataclass
class BatchResult:
    p: jax.Array  # float32[V, K] — column k is the ranking for alphas[k]
    alphas: tuple  # the K damping factors, column order
    iterations: int
    elapsed_ms: float


def compute_iweights(graph: Graph, alpha: float):
    """``alpha / out_weight_sum`` per vertex, 0 if dangling (pr.hxx:78-92)."""
    out_wsum = jax.ops.segment_sum(
        graph.values,
        graph.edge_src,
        num_segments=graph.n_vertices,
        indices_are_sorted=True,
    )
    return jnp.where(out_wsum != 0.0, alpha / out_wsum, 0.0)


def pr_step(graph: Graph, p, iweights, alpha: float):
    """One power iteration (pure). Returns (p_next, linf_err)."""
    plast = p
    dsum = jnp.sum(jnp.where(iweights == 0.0, alpha * plast, 0.0))
    base = (1.0 - alpha + dsum) / graph.n_vertices
    from gunrock_tpu.ops.segment import seg_sum_sorted

    src = graph.csc_rows
    contrib = plast[src] * iweights[src] * graph.csc_values
    p = base + seg_sum_sorted(contrib, graph.csc_offsets)
    err = jnp.max(jnp.abs(p - plast))
    return p, err


def pr_kernel(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 10_000,
):
    """Pure PageRank to convergence. Returns (p, iterations)."""
    V = graph.n_vertices
    iweights = compute_iweights(graph, alpha)
    p0 = jnp.full(V, 1.0 / V, dtype=jnp.float32)

    def cond(carry):
        it, p, err = carry
        return (err >= tol) & (it < max_iterations)

    def body(carry):
        it, p, _ = carry
        p, err = pr_step(graph, p, iweights, alpha)
        return it + 1, p, err

    it, p, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf))
    )
    return p, it


class PrProblem(Problem):
    def __init__(self, graph: Graph, param: Param):
        super().__init__(graph)
        self.param = param

    def reset(self):
        V = self.graph.n_vertices
        return {
            "p": jnp.full(V, 1.0 / V, dtype=jnp.float32),
            "iweights": compute_iweights(self.graph, self.param.alpha),
            "err": jnp.float32(jnp.inf),
        }


class PrEnactor(Enactor):
    def __init__(self, problem, max_iterations: int = 10_000):
        super().__init__(problem, max_iterations=max_iterations)

    def prepare_frontier(self):
        return self.problem.reset()

    def loop(self, state):
        p, err = pr_step(
            self.problem.graph, state["p"], state["iweights"], self.problem.param.alpha
        )
        return {**state, "p": p, "err": err}

    def is_converged(self, state):
        # Reference checks from iteration >= 1 (pr.hxx:172-176); err starts
        # at +inf so the first check is naturally false.
        return state["err"] < self.problem.param.tol


def run(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    options: Options | None = None,
    warmup: bool = True,
) -> Result:
    """Role of reference ``pr::run`` (pr.hxx:211-230). With
    ``options.load_balance == PALLAS_MERGE_PATH`` the edge scatter runs
    through the bucketed plus-times Pallas kernel."""
    max_it = 10_000
    if options is not None and options.max_iterations:
        max_it = options.max_iterations

    from gunrock_tpu.ops.configs import LoadBalance, default_options

    if options is None:
        options = default_options()
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
        import time

        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.ops.pallas.layout import dense_window_chunk
        from gunrock_tpu.ops.pallas.semiring import pull_layout

        # PR is dense-only: the bigger-chunk layout wins (see
        # layout.dense_window_chunk; BASELINE round-4 chunk sweep)
        dwc = dense_window_chunk(graph.n_vertices, use_interpret())
        w, c = dwc if dwc else (None, None)
        layout = pull_layout(graph, window=w, chunk=c)  # host-side
        # layout as jit argument (closure would bake it into the HLO)
        from gunrock_tpu.ops.pallas import use_interpret
        from gunrock_tpu.utils.jitcache import cached_jit

        fn = cached_jit(
            ("pr_pallas", alpha, tol, max_it, use_interpret()),
            lambda: lambda g, lay: pr_kernel_pallas(
                g, alpha, tol, max_it, layout=lay
            ),
        )
        if warmup:
            jax.block_until_ready(fn(graph, layout))
        t0 = time.perf_counter()
        p, it = jax.block_until_ready(fn(graph, layout))
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return Result(p=p, iterations=int(it), elapsed_ms=elapsed_ms)

    problem = PrProblem(graph, Param(alpha=alpha, tol=tol))
    enactor = PrEnactor(problem, max_iterations=max_it)
    state, elapsed_ms = enactor.enact(warmup=warmup)
    return Result(p=state["p"], iterations=int(state["iteration"]), elapsed_ms=elapsed_ms)


def pr_kernel_pallas(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iterations: int = 10_000,
    interpret: bool | None = None,
    layout=None,
):
    """PageRank with the Pallas bucketed plus-times advance."""
    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.semiring import bucketed_semiring_spmv, pull_layout

    if layout is None:
        layout = pull_layout(graph)  # requires a concrete (unjitted) graph
    if interpret is None:
        interpret = use_interpret()
    V = graph.n_vertices
    iweights = compute_iweights(graph, alpha)
    p0 = jnp.full(V, 1.0 / V, dtype=jnp.float32)

    def cond(carry):
        it, p, err = carry
        return (err >= tol) & (it < max_iterations)

    def body(carry):
        it, p, _ = carry
        plast = p
        dsum = jnp.sum(jnp.where(iweights == 0.0, alpha * plast, 0.0))
        base = (1.0 - alpha + dsum) / V
        p = base + bucketed_semiring_spmv(
            layout, plast * iweights, "plus_times", interpret=interpret
        )
        return it + 1, p, jnp.max(jnp.abs(p - plast))

    it, p, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf))
    )
    return p, it


def pr_batch_kernel_xla(
    graph: Graph,
    alphas,
    tol: float = 1e-6,
    max_iterations: int = 10_000,
):
    """[V, K] multi-damping power iteration on the XLA segment path (the
    non-Pallas backend of :func:`run_batch`): one CSC gather feeds all K
    columns, so the serialized scatter cost amortizes across the sweep.
    Returns (p f32[V, K], iterations)."""
    from gunrock_tpu.ops.segment import seg_sum_sorted

    alphas = jnp.asarray(alphas, jnp.float32)
    K = alphas.shape[0]
    V = graph.n_vertices
    out_wsum = jax.ops.segment_sum(
        graph.values, graph.edge_src, num_segments=V, indices_are_sorted=True
    )
    inv_wsum = jnp.where(out_wsum != 0.0, 1.0 / out_wsum, 0.0)
    dangling = out_wsum == 0.0
    p0 = jnp.full((V, K), 1.0 / V, dtype=jnp.float32)

    def cond(carry):
        it, p, err = carry
        return (err >= tol) & (it < max_iterations)

    def body(carry):
        it, p, _ = carry
        plast = p
        dsum = jnp.sum(jnp.where(dangling[:, None], plast, 0.0), axis=0) * alphas
        base = (1.0 - alphas + dsum) / V  # [K]
        x = plast * inv_wsum[:, None] * alphas[None, :]  # [V, K]
        src = graph.csc_rows
        contrib = x[src] * graph.csc_values[:, None]  # [E, K]
        p = base[None, :] + seg_sum_sorted(contrib, graph.csc_offsets)
        return it + 1, p, jnp.max(jnp.abs(p - plast))

    it, p, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf))
    )
    return p, it


def _pr_pull_layout(graph: Graph, interpret: bool):
    """Weighted pull layout shared by run_batch and pr_batch_kernel_spmm
    (one cache entry per graph; the key name predates the weighted
    values it carries — kept for cache continuity)."""
    from gunrock_tpu.ops.pallas.layout import build_auto_layout, cached_layout

    return cached_layout(
        graph.col_indices,
        lambda: build_auto_layout(
            hostcache.host(graph, "col_indices"),  # rows = destinations (pull)
            hostcache.host(graph, "edge_src"),
            hostcache.host(graph, "values"),
            graph.n_vertices,
            interpret=interpret,
        ),
        ("pr_pull_unit", "auto", interpret),
    )



def run_batch(
    graph: Graph,
    alphas,
    tol: float = 1e-6,
    options: Options | None = None,
    warmup: bool = True,
) -> BatchResult:
    """Multi-damping PageRank sweep: all K alphas advance together with
    the K axis riding the SpMM batch dimension (role of the reference's
    batch operator, operators/batch/batch.hxx:61-84, which round-robins
    *independent* runs over CPU threads; here the batch IS one kernel —
    measured 2.5x per-alpha vs sequential runs in ab_pr_batch.py)."""
    import time

    from gunrock_tpu.ops.configs import LoadBalance, default_options
    from gunrock_tpu.utils.jitcache import cached_jit

    alphas = tuple(float(a) for a in alphas)
    if options is None:
        options = default_options()
    max_it = options.max_iterations or 10_000
    if options.load_balance == LoadBalance.PALLAS_MERGE_PATH:
        from gunrock_tpu.ops.pallas import use_interpret

        interp = use_interpret()
        # layout built host-side BEFORE tracing, passed as a jit argument
        # (closing over it bakes it into the HLO — CLAUDE.md SMEM note)
        layout = _pr_pull_layout(graph, interp)
        fn = cached_jit(
            ("pr_batch_pallas", alphas, tol, max_it, interp),
            lambda: lambda g, lay: pr_batch_kernel_spmm(
                g, jnp.asarray(alphas, jnp.float32), tol, max_it,
                layout=lay, interpret=interp,
            ),
        )
        args = (graph, layout)
    else:
        fn = cached_jit(
            ("pr_batch_xla", alphas, tol, max_it),
            lambda: lambda g: pr_batch_kernel_xla(
                g, jnp.asarray(alphas, jnp.float32), tol, max_it
            ),
        )
        args = (graph,)
    if warmup:
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    p, it = jax.block_until_ready(fn(*args))
    elapsed_ms = (time.perf_counter() - t0) * 1e3
    return BatchResult(p=p, alphas=alphas, iterations=int(it),
                       elapsed_ms=elapsed_ms)


def pr_batch_kernel_spmm(
    graph: Graph,
    alphas,  # float32[K] damping factors
    tol: float = 1e-6,
    max_iterations: int = 10_000,
    layout=None,
    interpret: bool | None = None,
):
    """Multi-damping PageRank sweep with the K axis on the bucketed SpMM:
    all K power iterations advance together through one [V, K] kernel, so
    the windowed one-hot masks amortize across the whole sweep (the same
    batching recast as msbfs/bc_batch/ppr_batch — ops/pallas/spmm.py).
    Converges when EVERY column's L-inf error is under tol.
    Returns (p f32[V, K], iterations)."""
    import numpy as np

    from gunrock_tpu.ops.pallas import use_interpret
    from gunrock_tpu.ops.pallas.layout import build_auto_layout, cached_layout
    from gunrock_tpu.ops.pallas.spmm import bucketed_spmm

    if interpret is None:
        interpret = use_interpret()
    if layout is None:
        layout = _pr_pull_layout(graph, interpret)
    alphas = jnp.asarray(alphas, jnp.float32)
    K = alphas.shape[0]
    V = graph.n_vertices
    # per-column iweights: alpha_k / out_wsum (0 if dangling)
    out_wsum = jax.ops.segment_sum(
        graph.values, graph.edge_src, num_segments=V, indices_are_sorted=True
    )
    inv_wsum = jnp.where(out_wsum != 0.0, 1.0 / out_wsum, 0.0)  # [V]
    dangling = out_wsum == 0.0
    p0 = jnp.full((V, K), 1.0 / V, dtype=jnp.float32)

    # The bucketed SpMM accumulates via two-pass bf16 MXU matmuls, whose
    # rounding floor (~1e-5 relative) can sit above a tight tol and
    # limit-cycle forever — stall detection stops the loop once the
    # L-inf step stops shrinking (the iterate is then at the kernel's
    # precision floor, verified ~5e-5 vs exact single runs on chip).
    def cond(carry):
        it, p, err, stall = carry
        return (err >= tol) & (it < max_iterations) & (stall < 16)

    def body(carry):
        it, p, err_prev, stall = carry
        plast = p
        dsum = jnp.sum(
            jnp.where(dangling[:, None], plast, 0.0), axis=0
        ) * alphas  # [K]
        base = (1.0 - alphas + dsum) / V  # [K]
        x = plast * inv_wsum[:, None] * alphas[None, :]  # [V, K]
        p = base[None, :] + bucketed_spmm(layout, x, interpret=interpret)
        err = jnp.max(jnp.abs(p - plast))
        stall = jnp.where(err < err_prev, 0, stall + 1)
        return it + 1, p, err, stall

    it, p, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, jnp.float32(jnp.inf), jnp.int32(0))
    )
    return p, it
