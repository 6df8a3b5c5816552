"""pygunrock-compatible high-level API with tensor interop.

Role of the reference nanobind module (reference python/src/gunrock/
bindings.cu:84-479, __init__.py:10-120): ``sssp(graph, single_source,
distances, predecessors, ...)``-style entry points that fill
caller-provided tensors and return elapsed milliseconds, plus per-
algorithm ``*_run`` wrappers. The reference reads torch tensors'
``data_ptr()`` for zero-copy GPU access; on TPU the analogous contract is
"results are written into your tensor" — jax owns device memory, so the
outputs are copied into the provided torch/numpy tensor on return.

Accepted output containers: ``torch.Tensor`` (CPU), ``numpy.ndarray``, or
``None`` (results only on the returned object).
"""

from __future__ import annotations

import numpy as np

from gunrock_tpu.graph import Graph
from gunrock_tpu.ops.configs import Options


def as_device_array(x):
    """Zero-copy-where-possible import of an external tensor (role of the
    reference's ``data_ptr()``/``__cuda_array_interface__`` reads,
    bindings.cu:65-82). Torch CPU tensors and numpy arrays enter jax via
    DLPack — no copy on the CPU backend, a single H2D transfer on TPU.
    The reference's zero-copy is only free because producer and consumer
    share one GPU address space; across host->TPU a transfer is inherent,
    so the contract here is "at most one copy, none when colocated"."""
    try:
        import torch

        if isinstance(x, torch.Tensor):
            import jax.numpy as jnp

            return jnp.from_dlpack(x.contiguous())
    except (ImportError, TypeError):
        pass
    if isinstance(x, np.ndarray) and x.flags.c_contiguous:
        try:
            import jax.numpy as jnp

            return jnp.from_dlpack(x)
        except (TypeError, RuntimeError, BufferError):
            pass
    import jax.numpy as jnp

    return jnp.asarray(x)


def _fill(tensor, values) -> None:
    """Copy device results into a caller-provided tensor in place."""
    if tensor is None:
        return
    arr = np.asarray(values)
    try:
        import torch

        if isinstance(tensor, torch.Tensor):
            # copy so torch never aliases jax's (read-only) buffer
            src = np.ascontiguousarray(arr).copy()
            tensor.copy_(torch.from_numpy(src).to(tensor.dtype))
            return
    except ImportError:
        pass
    if isinstance(tensor, np.ndarray):
        tensor[...] = arr
        return
    raise TypeError(f"unsupported output tensor type {type(tensor)!r}")


def sssp(graph: Graph, single_source: int, distances=None, predecessors=None,
         context=None, options: Options | None = None) -> float:
    """Reference ``gunrock.sssp`` (bindings.cu:186-224). Returns ms."""
    from gunrock_tpu.algorithms import sssp as _sssp

    del context  # mesh/device context is implicit in jax
    res = _sssp.run(graph, single_source, options=options)
    _fill(distances, res.distances)
    _fill(predecessors, res.predecessors)
    return res.elapsed_ms


def bfs(graph: Graph, single_source: int, distances=None, predecessors=None,
        context=None, options: Options | None = None) -> float:
    """Reference ``gunrock.bfs`` (bindings.cu:233-258). Returns ms."""
    from gunrock_tpu.algorithms import bfs as _bfs

    del context
    res = _bfs.run(graph, single_source, options=options)
    _fill(distances, res.distances)
    _fill(predecessors, res.predecessors)
    return res.elapsed_ms


def sssp_run(graph, single_source, options=None):
    from gunrock_tpu.algorithms import sssp as _sssp

    return _sssp.run(graph, single_source, options=options)


def bfs_run(graph, single_source, options=None):
    from gunrock_tpu.algorithms import bfs as _bfs

    return _bfs.run(graph, single_source, options=options)


def bc_run(graph, single_source, options=None):
    from gunrock_tpu.algorithms import bc as _bc

    return _bc.run(graph, single_source, options=options)


def pr_run(graph, alpha=0.85, tol=1e-6, options=None, alphas=None):
    """``alphas=[...]`` runs the batched multi-damping sweep
    (pr.run_batch — one [V, K] kernel for all K dampings)."""
    from gunrock_tpu.algorithms import pr as _pr

    if alphas is not None:
        return _pr.run_batch(graph, alphas, tol=tol, options=options)
    return _pr.run(graph, alpha=alpha, tol=tol, options=options)


def ppr_run(graph, seed, alpha=0.15, epsilon=1e-6, options=None):
    from gunrock_tpu.algorithms import ppr as _ppr

    return _ppr.run(graph, seed, alpha=alpha, epsilon=epsilon, options=options)


def tc_run(graph, reduce_all_triangles=True, options=None):
    from gunrock_tpu.algorithms import tc as _tc

    return _tc.run(graph, reduce_all_triangles=reduce_all_triangles, options=options)


def color_run(graph, seed=0, options=None):
    from gunrock_tpu.algorithms import color as _color

    return _color.run(graph, seed=seed, options=options)


def kcore_run(graph, options=None):
    from gunrock_tpu.algorithms import kcore as _kcore

    return _kcore.run(graph, options=options)


def geo_run(graph, latitude, longitude, total_iterations=3,
            spatial_iterations=1000, options=None):
    from gunrock_tpu.algorithms import geo as _geo

    return _geo.run(graph, latitude, longitude,
                    total_iterations=total_iterations,
                    spatial_iterations=spatial_iterations, options=options)


def hits_run(graph, max_iterations=50, options=None):
    from gunrock_tpu.algorithms import hits as _hits

    return _hits.run(graph, max_iterations=max_iterations, options=options)


def mst_run(graph, options=None):
    from gunrock_tpu.algorithms import mst as _mst

    return _mst.run(graph, options=options)


def spmv_run(graph, x, options=None):
    from gunrock_tpu.algorithms import spmv as _spmv

    return _spmv.run(graph, x, options=options)


def spgemm_run(graph_a, graph_b, options=None):
    from gunrock_tpu.algorithms import spgemm as _spgemm

    return _spgemm.run(graph_a, graph_b, options=options)
