"""Unrolled triangular solves for small static sizes.

``jax.scipy.linalg.solve_triangular`` / ``cho_solve`` lower to blocked
triangular-solve routines that serialize badly on TPU for the tiny (n <= 32)
systems inside the filter loop and carry heavy autodiff residuals. With
static n, forward/backward substitution unrolls into n fused multiply-adds
over the batch — same treatment as ops/small_qr.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_UNROLLED_DIM = 32


def solve_lower_unrolled(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solves L x = b with L [..., n, n] lower-triangular, b [..., n] or
    [..., n, k]; unrolled forward substitution."""
    n = chol.shape[-1]
    vec = b.ndim == chol.ndim - 1
    rhs = b[..., None] if vec else b  # [..., n, k]
    xs = []
    for i in range(n):
        acc = rhs[..., i, :]
        for j in range(i):
            acc = acc - chol[..., i, j, None] * xs[j]
        xs.append(acc / chol[..., i, i, None])
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def solve_upper_unrolled(u: jax.Array, b: jax.Array) -> jax.Array:
    """Solves U x = b with U [..., n, n] upper-triangular (back substitution)."""
    n = u.shape[-1]
    vec = b.ndim == u.ndim - 1
    rhs = b[..., None] if vec else b
    xs = [None] * n
    for i in reversed(range(n)):
        acc = rhs[..., i, :]
        for j in range(i + 1, n):
            acc = acc - u[..., i, j, None] * xs[j]
        xs[i] = acc / u[..., i, i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def solve_triangular_small(chol: jax.Array, b: jax.Array, lower: bool = True) -> jax.Array:
    n = chol.shape[-1]
    if n > MAX_UNROLLED_DIM:
        from jax.scipy.linalg import solve_triangular

        return solve_triangular(chol, b, lower=lower)
    return solve_lower_unrolled(chol, b) if lower else solve_upper_unrolled(chol, b)


def cho_solve_small(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solves (L L^T) x = b given a triangular factor (sign-indefinite
    diagonals allowed: (LD)(LD)^T = L L^T)."""
    n = chol.shape[-1]
    if n > MAX_UNROLLED_DIM:
        from jax.scipy.linalg import cho_solve

        return cho_solve((chol, True), b)
    y = solve_lower_unrolled(chol, b)
    return solve_upper_unrolled(jnp.swapaxes(chol, -1, -2), y)
