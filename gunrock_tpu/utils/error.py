"""Error handling.

Role of reference include/gunrock/error.hxx:13-48: a framework exception
type and ``throw_if_exception(condition, message)`` guards. XLA/jax raise
their own exceptions for device errors; these helpers cover framework-
level invariant checks (e.g. MST's no-progress guard, mst.hxx:245-251).
"""

from __future__ import annotations


class GunrockError(RuntimeError):
    """Role of reference ``gunrock::error::exception_t``."""


def throw_if_exception(condition: bool, message: str = "") -> None:
    """Role of reference ``error::throw_if_exception`` (error.hxx:38-46)."""
    if condition:
        raise GunrockError(message or "gunrock_tpu runtime error")
