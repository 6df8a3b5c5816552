"""Experimental subsystems.

The reference ships an experimental *async* runtime — persistent-kernel
MPMC work queues driving barrier-free BFS (reference
include/gunrock/container/experimental/async/queue.hxx:17-356,
algorithms/experimental/async/bfs.hxx) — explicitly flagged experimental
and disabled by default.

**Status here: non-goal for the TPU build** (SURVEY.md section 2.8 /
section 7 non-goals). XLA has no persistent-kernel analog: a TPU program
is a compiled dataflow graph, not a resident grid polling device queues.
The asynchrony the reference chases (avoiding BSP barrier latency) is
addressed differently on TPU:

- whole convergence loops compile into one device program
  (``lax.while_loop``), so the per-iteration "barrier" costs no host
  round trip at all, and
- direction-optimized push steps (algorithms/bfs.py, sssp.py) shrink the
  tail iterations where async queues would have helped most.

If a future round wants genuine async, the building blocks exist in
Pallas (remote DMA + semaphores, see ops/pallas), but the measured
BSP-in-one-program design has made it unnecessary so far.
"""
