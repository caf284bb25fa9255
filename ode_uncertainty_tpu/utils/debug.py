"""Numerical anomaly detection.

TPU-native replacement for the reference's host-side NaN/Inf checks (the
deprecated UKF raised ValueError from ``detect_anomaly``,
src/filters/deprecated/ukf.py): traced-code assertions via
``jax.debug.callback`` / ``checkify``-style predicates, plus a global
debug-nans switch.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans (errors at the op that produced the first NaN)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def count_nonfinite(tree: Any) -> jax.Array:
    """Total count of non-finite elements across a pytree (traceable)."""
    leaves = [jnp.sum(~jnp.isfinite(x)) for x in jax.tree.leaves(tree) if hasattr(x, "dtype")
              and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.zeros((), jnp.int32)
    return sum(leaves)


def assert_finite(tree: Any, label: str = "state") -> None:
    """Host assertion inside traced code: raises on the first non-finite
    value (debug tool; adds a host sync per call site)."""

    def _check(count):
        if int(count) > 0:
            raise FloatingPointError(f"{label}: {int(count)} non-finite values")

    jax.debug.callback(_check, count_nonfinite(tree))


def tap_stats(x: jax.Array, label: str = "") -> None:
    """Prints min/max/mean of a traced array (deferred host print)."""
    jax.debug.print(
        label + " min={a} max={b} mean={c}", a=jnp.min(x), b=jnp.max(x), c=jnp.mean(x)
    )
