"""Experimental subsystems.

The reference ships an experimental *async* runtime — persistent-kernel
MPMC work queues driving barrier-free BFS (reference
include/gunrock/container/experimental/async/queue.hxx:17-356,
algorithms/experimental/async/bfs.hxx) — explicitly flagged experimental
and disabled by default.

**Round-3 status: implemented as a TPU-native analog.** XLA has no
persistent-kernel analog (a TPU program is a compiled dataflow graph,
not a resident grid polling device queues), so the asynchronous
SEMANTICS — relaxations observing values produced within the same pass
— are delivered by :mod:`gunrock_tpu.experimental.async_sweep`:
deterministic Gauss-Seidel block sweeps with per-block inner
convergence, alternating forward/backward order, the whole loop one
compiled ``lax.while_loop``. Same convergence class as the reference's
chaotic label correcting, with a fixed total order replacing the GPU's
races. Measured where it matters (the high-diameter graphs whose level
counts sink the BSP kernels): 64x64 grid BFS = 2 sweeps / 6
full-pass-equivalents vs 126 BSP levels. ``--mode async`` on the
bfs/sssp example drivers; ``ordering="rcm"`` restores path monotonicity
on scrambled meshes (graph/reorder.rcm_sort).

The BSP kernels remain the default: on power-law graphs (small
diameter) direction-optimized BSP is already within a pass or two of
the sweep schedule, and the Pallas frontier-sparse kernels beat the
sweep solver's scatter-based segment_min per pass.
"""
