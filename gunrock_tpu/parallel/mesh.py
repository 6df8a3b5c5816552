"""Device mesh bootstrap.

Role of the reference's ``multi_context_t`` (reference
include/gunrock/cuda/context.hxx:146-216): enumerate devices and hand the
rest of the framework a parallel execution context. On TPU the context is a
``jax.sharding.Mesh``; peer access/NCCL init is replaced by XLA collectives
over ICI which need no setup.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

EDGE_AXIS = "edges"


def make_mesh(n_devices: int | None = None, axis_name: str = EDGE_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Multi-host: ``jax.devices()`` already enumerates the global device set
    once ``jax.distributed.initialize()`` has run, so the same call shapes
    a pod-slice mesh; axis order rides ICI.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
