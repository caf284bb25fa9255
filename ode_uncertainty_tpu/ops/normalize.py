"""Min-max parameter normalization (optimizers work in [0, 1]^P).

Parity: /root/reference/src/utils.py:131-178. Operates on pytrees leafwise
(the reference round-trips through ravel_pytree; leafwise maps compile to
the same fused elementwise ops without the flatten/unflatten detour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(values, mins, maxs):
    """Maps values into [0, 1] per-leaf given min/max pytrees."""
    return jax.tree.map(lambda v, lo, hi: (v - lo) / (hi - lo), values, mins, maxs)


def inv_normalize(values, mins, maxs):
    """Inverse of :func:`normalize`."""
    return jax.tree.map(lambda v, lo, hi: v * (hi - lo) + lo, values, mins, maxs)


def clip01(values):
    """Projects a pytree onto the unit box."""
    return jax.tree.map(lambda v: jnp.clip(v, 0.0, 1.0), values)
