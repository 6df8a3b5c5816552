"""Problem base: per-algorithm persistent state.

Role of reference include/gunrock/framework/problem.hxx:29-58 — holds the
graph plus algorithm data, with ``init()`` (one-time allocation) and
``reset()`` (per-run reinitialization) hooks. In the TPU design, "device
allocation" is just building jax arrays, so ``init``/``reset`` return the
initial state pytree consumed by the enactor's while_loop.
"""

from __future__ import annotations

from gunrock_tpu.graph import Graph


class Problem:
    def __init__(self, graph: Graph):
        self.graph = graph

    def init(self):  # one-time setup (override as needed)
        return None

    def reset(self):
        """Return the initial algorithm state pytree. Must be overridden."""
        raise NotImplementedError
