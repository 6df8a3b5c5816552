"""Wall-clock timer with the reference timer API.

Role of reference ``util::timer_t`` (include/gunrock/util/timer.hxx:18-62):
``begin()`` / ``end() -> ms`` around device work. GPU events become
``block_until_ready`` fences (the only sound way to time async XLA
dispatch); ``reset()`` mirrors the reference's multi-run safety.
"""

from __future__ import annotations

import time


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
