"""Host-side mirror of Graph device arrays.

The reference keeps graph data in host memory and copies to device
explicitly (graph/build.hxx:33-166); a JAX Graph holds device arrays
only. On the tunneled TPU a device->host read of a scale-20 edge array
costs minutes, yet every Pallas layout build needs the host copy of
arrays that EXISTED on host moments earlier (the builder transferred
them). This side table keeps those host copies alive exactly as long as
the graph's device arrays do (weakref-anchored, same lifetime contract
as ops/pallas/layout.cached_layout).
"""

from __future__ import annotations

import weakref

import numpy as np

_CACHE: dict[int, tuple[weakref.ref, dict[str, np.ndarray]]] = {}


def _evictor(key: int):
    def cb(_ref):
        _CACHE.pop(key, None)

    return cb


def register(graph, **arrays: np.ndarray) -> None:
    """Record host copies of ``graph``'s arrays (by field name)."""
    anchor = graph.col_indices
    key = id(anchor)
    ent = _CACHE.get(key)
    if ent is None or ent[0]() is not anchor:
        ent = (weakref.ref(anchor, _evictor(key)), {})
        _CACHE[key] = ent
    ent[1].update(arrays)


def host(graph, name: str) -> np.ndarray:
    """Host numpy copy of ``graph.<name>``: cached if registered at build
    time, otherwise one device->host read memoized for the graph's
    lifetime."""
    anchor = graph.col_indices
    key = id(anchor)
    ent = _CACHE.get(key)
    if ent is not None and ent[0]() is anchor and name in ent[1]:
        return ent[1][name]
    arr = np.asarray(getattr(graph, name))
    register(graph, **{name: arr})
    return arr
