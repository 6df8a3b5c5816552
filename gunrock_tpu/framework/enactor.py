"""Enactor: the BSP iteration driver, compiled to one XLA program.

The reference enactor (include/gunrock/framework/enactor.hxx:31-344) runs a
host-driven loop — ``enact() = prepare_frontier -> while(!is_converged)
{ loop(); ++iteration; } -> finalize`` — paying a host<->device round trip
per iteration for the frontier-size check (SURVEY.md section 3.1).

The TPU enactor keeps the same virtual interface (``prepare_frontier`` /
``loop`` / ``is_converged`` / ``finalize``) but compiles the *entire*
convergence loop into a single ``jax.lax.while_loop``: the convergence
predicate is a device-side reduction, iteration state is a fixed-shape
pytree, and the host is only involved once per ``enact()``.

State contract: ``reset()``/``prepare_frontier()`` produce a pytree; the
enactor threads ``(iteration, state)`` through the loop. Iteration count
doubles as the reference's ``search_depth`` metric (enactor.hxx:283-286).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp


class Enactor:
    """Subclass and override ``prepare_frontier``, ``loop`` and (optionally)
    ``is_converged`` / ``finalize`` — the reference's virtuals
    (enactor.hxx:304-342)."""

    def __init__(self, problem, max_iterations: int | None = None):
        self.problem = problem
        # Safety bound on the while_loop (algorithms converge earlier);
        # BFS-like algorithms can never exceed V iterations.
        self.max_iterations = max_iterations
        self._compiled = None

    # -- virtuals --------------------------------------------------------
    def prepare_frontier(self):
        """Return the initial state pytree (enactor.hxx:311)."""
        raise NotImplementedError

    def loop(self, state):
        """One BSP iteration: state -> state (enactor.hxx:304). The current
        iteration index is available as ``state['iteration']``."""
        raise NotImplementedError

    def is_converged(self, state):
        """Device-side convergence predicate. Default: frontier empty
        (enactor.hxx:328-330) — expects ``state['frontier']`` to be a
        dense mask or a frontier object with ``is_empty``."""
        frontier = state["frontier"]
        if hasattr(frontier, "is_empty"):
            return frontier.is_empty()
        return ~jnp.any(frontier)

    def finalize(self, state):
        """Post-loop extraction (enactor.hxx:342). Default: identity."""
        return state

    # -- driver ----------------------------------------------------------
    def _enact_fn(self, state):
        max_it = self.max_iterations
        if max_it is None:
            max_it = int(self.problem.graph.n_vertices) + 1

        def cond(carry):
            it, s = carry
            return (~self.is_converged(s)) & (it < max_it)

        def body(carry):
            it, s = carry
            s = dict(s)
            s["iteration"] = it
            s = self.loop(s)
            return it + 1, s

        state = dict(state)
        state.setdefault("iteration", jnp.int32(0))
        it, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        out = dict(out)
        out["iteration"] = it  # search depth at convergence
        return self.finalize(out)

    def enact(self, warmup: bool = True):
        """Run to convergence. Returns ``(final_state, elapsed_ms)``.

        ``elapsed_ms`` times one full compiled run (post-compilation when
        ``warmup`` is set) — the analog of the reference's GPU-event-timed
        ``enact()`` (enactor.hxx:262-287, the BASELINE measurement
        contract)."""
        if self._compiled is None:
            self._compiled = jax.jit(self._enact_fn)
        state0 = self.prepare_frontier()
        if warmup:
            from gunrock_tpu.utils.timer import force_real_execution

            force_real_execution()  # axon lazy-future guard
            jax.block_until_ready(self._compiled(state0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(self._compiled(state0))
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return out, elapsed_ms
