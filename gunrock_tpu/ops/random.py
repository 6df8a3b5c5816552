"""Device random fills (role of reference generate/random.hxx:20-33 —
``generate::random::uniform_distribution`` filling a device vector via
thrust + a host seed; here ``jax.random`` with explicit threefry keys,
which is deterministic per seed across hosts by construction — the
reproducibility the reference gets by fixing the thrust engine seed).

Used the same way the reference uses it: coloring randoms, smtx value
fills, benchmark operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(n: int, seed: int = 0, low: float = 0.0, high: float = 1.0,
            dtype=jnp.float32) -> jax.Array:
    """float fill over [low, high) (uniform_distribution(float) parity)."""
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n,), dtype=dtype, minval=low, maxval=high
    )


def uniform_int(n: int, seed: int = 0, low: int = 0,
                high: int = 2**31 - 1) -> jax.Array:
    """int32 fill over [low, high) (uniform_distribution(int) parity)."""
    return jax.random.randint(
        jax.random.PRNGKey(seed), (n,), low, high, dtype=jnp.int32
    )
