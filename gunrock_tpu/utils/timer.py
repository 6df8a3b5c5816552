"""Wall-clock timer with the reference timer API.

Role of reference ``util::timer_t`` (include/gunrock/util/timer.hxx:18-62):
``begin()`` / ``end() -> ms`` around device work. GPU events become
``block_until_ready`` fences (the only sound way to time async XLA
dispatch); ``reset()`` mirrors the reference's multi-run safety.
"""

from __future__ import annotations

import time


def force_real_execution() -> None:
    """Flip the axon tunnel out of lazy-future mode.

    Until a process performs its first device->host READ, every timing on
    the tunneled TPU is a fake ~0.1 ms future. ``block_until_ready`` does
    NOT count — only an actual D2H read does. Call this once before any
    measurement. (Benchmarks used to get this implicitly from reading
    degree arrays off-device; graph/hostcache.py removed those reads, so
    the trigger must be explicit.)"""
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros(8))


class Timer:
    def __init__(self):
        self._t0 = None
        self._ms = 0.0

    def begin(self) -> None:
        self._t0 = time.perf_counter()

    def end(self, *arrays) -> float:
        """Block on ``arrays`` (if given) and return elapsed milliseconds."""
        if arrays:
            import jax

            jax.block_until_ready(arrays)
        self._ms = (time.perf_counter() - self._t0) * 1e3
        return self._ms

    def milliseconds(self) -> float:
        return self._ms

    def reset(self) -> None:
        self._t0 = None
        self._ms = 0.0
