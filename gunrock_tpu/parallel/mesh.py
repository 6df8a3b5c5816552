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


def make_mesh_2d(
    n_hosts: int,
    chips_per_host: int | None = None,
    axis_names: tuple[str, str] = ("host", "chip"),
) -> Mesh:
    """Hierarchical (host, chip) mesh — SURVEY §2.8's DCN-aware 2-level
    partition (exceeds the reference's single-node multi-GPU contexts,
    cuda/context.hxx:146-216). Vertex shards run host-major; the sharded
    layer's halo exchange then aggregates cross-host traffic into one
    DCN message per host pair (`sharded._a2a_shards`), with per-chip
    rerouting riding ICI.

    On a real pod slice, call after ``jax.distributed.initialize()`` so
    ``jax.devices()`` enumerates the global set grouped by host (JAX
    orders devices by process) — the outer axis then truly maps to DCN.
    """
    import numpy as np

    devices = jax.devices()
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    need = n_hosts * chips_per_host
    if need > len(devices):
        raise ValueError(
            f"requested {n_hosts}x{chips_per_host} devices, only "
            f"{len(devices)} available"
        )
    return Mesh(
        np.asarray(devices[:need]).reshape(n_hosts, chips_per_host),
        axis_names,
    )
