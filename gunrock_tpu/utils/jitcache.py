"""Process-lifetime jit executable cache.

Role of the reference's compile-once kernel instantiation: its CUDA
kernels are template-instantiated a single time per binary at C++
compile time (framework/enactor.hxx:229-288 re-enters prebuilt kernels
every iteration), whereas JAX recompiles whenever the jitted callable's
identity changes.

``jax.jit(lambda ...)`` at a run()-call site creates a NEW Python
callable per invocation, so jax's own jit cache misses and the kernel
retraces + recompiles on EVERY call — ~90 s per compile over the axon
remote-compile tunnel, and each fresh executable re-triggers the
per-call argument-rebinding penalty on subsequently-run hot kernels
(CLAUDE.md "executable-switch rebinding").

``cached_jit(key, make)`` returns one jitted callable per ``key`` for
the life of the process. ``make`` is a zero-arg factory for the
function to jit (evaluated once per key). The wrapped function must
close over NOTHING graph-specific — pass graphs and layouts as
ARGUMENTS; closed-over device arrays become HLO constants and overflow
the remote-compile payload at scale 20 (HTTP 413).
"""

from __future__ import annotations

import jax

_CACHE: dict = {}


def cached_jit(key, make):
    if key not in _CACHE:
        _CACHE[key] = jax.jit(make())
    return _CACHE[key]
