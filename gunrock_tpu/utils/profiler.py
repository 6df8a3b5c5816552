"""Tracing / profiling hooks.

Role of the reference's observability stack (SURVEY.md section 5): GPU
event timers around ``enact()`` (util/timer.hxx) and NVBench hardware
counters. The TPU equivalents are ``jax.profiler`` traces viewable in
xprof/TensorBoard and per-op cost analysis from compiled executables.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gunrock_tpu_trace"):
    """Capture a device trace around a block::

        with profiler.trace("/tmp/trace"):
            bfs.run(graph, 0)

    View with TensorBoard's profile plugin / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span context (shows up in trace timelines)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args):
    """XLA's per-executable cost model: flops/bytes estimates (the
    HW-counter-free analog of NVBench's DRAM/L1/L2 collection)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    return compiled.cost_analysis()
