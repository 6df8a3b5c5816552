"""Pallas TPU kernels — the speed-of-light operator path.

Role of the reference's hand-tuned load-balanced kernels
(operators/advance/merge_path_v2.hxx, block_mapped.hxx): explicit control
over memory movement and compute placement for the irregular hot ops that
XLA lowers poorly on TPU (duplicate-index scatters serialize; per-element
gathers run on the scalar core).

The central TPU-native idea (`layout.py`): edges are bucketed offline into
(row-window, col-window) tiles so both the gather (x[col]) and the
scatter-reduce (y[row] +=) become *windowed one-hot matmuls* — dense
MXU/VPU work on narrow spans instead of serialized random access. This is
the merge-path fixed-work-per-tile discipline recast for a systolic-array
machine: every chunk is exactly C edges of perfectly load-balanced work,
whatever the degree distribution.
"""

from gunrock_tpu.ops.pallas.layout import BucketedEdges, build_bucketed_layout  # noqa: F401


def use_interpret() -> bool:
    """True when kernels must run in interpreter mode (no TPU backend)."""
    import jax

    return jax.default_backend() in ("cpu", "gpu")
