"""Invalid-sentinel type system.

The core mechanism for marking dead frontier entries *in place* — the same
role as the reference's ``gunrock::numeric_limits<T>::invalid()`` /
``util::limits::is_valid()`` (reference include/gunrock/util/type_limits.hxx:16-71):

- signed integers  -> -1
- unsigned integers -> max value
- floats           -> NaN

On TPU, sentinel padding is how dynamic frontier sizes live inside static
XLA shapes: a fixed-capacity queue is padded with ``invalid()`` entries and
every operator skips them.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Canonical sentinels for the default vertex/edge dtype (int32).
INVALID_VERTEX = np.int32(-1)
INVALID_EDGE = np.int32(-1)


def invalid(dtype) -> jnp.ndarray:
    """Return the invalid sentinel for ``dtype`` as a 0-d array.

    Mirrors reference util/type_limits.hxx:16-58 semantics exactly:
    signed -> -1, unsigned -> max, float -> NaN.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.nan, dtype=dtype)
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return jnp.asarray(jnp.iinfo(dtype).max, dtype=dtype)
    if jnp.issubdtype(dtype, jnp.signedinteger):
        return jnp.asarray(-1, dtype=dtype)
    if dtype == jnp.bool_:
        return jnp.asarray(False)
    raise TypeError(f"no invalid sentinel for dtype {dtype}")


def is_valid(x) -> jnp.ndarray:
    """Elementwise validity test (reference util/type_limits.hxx:61-71)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return ~jnp.isnan(x)
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        return x != jnp.iinfo(x.dtype).max
    if jnp.issubdtype(x.dtype, jnp.signedinteger):
        return x >= 0
    if x.dtype == jnp.bool_:
        return x
    raise TypeError(f"no validity test for dtype {x.dtype}")


def reduce_identity(dtype, reduce: str) -> jnp.ndarray:
    """Identity element for a segmented reduction over ``dtype``.

    Used by advance to mask out inactive edges: inactive lanes contribute
    the identity, exactly replacing the reference's conditional atomics.
    """
    dtype = jnp.dtype(dtype)
    if reduce in ("sum", "add"):
        return jnp.asarray(0, dtype=dtype)
    if reduce == "min":
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.asarray(jnp.inf, dtype=dtype)
        return jnp.asarray(jnp.iinfo(dtype).max, dtype=dtype)
    if reduce == "max":
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.asarray(-jnp.inf, dtype=dtype)
        return jnp.asarray(jnp.iinfo(dtype).min, dtype=dtype)
    if reduce in ("or", "any"):
        return jnp.asarray(False)
    raise ValueError(f"unknown reduction {reduce!r}")


def unreached(dtype) -> jnp.ndarray:
    """Sentinel for 'not yet reached' distances/labels.

    BFS/SSSP distances start at the min-reduction identity (int max / +inf)
    so that min-updates behave like the reference's ``atomic::min`` on
    freshly-initialized arrays (reference algorithms/bfs.hxx:105-128).
    """
    return reduce_identity(dtype, "min")
