"""Process-noise covariance update functions.

These inject the solver's local-error estimate ``eps`` into the filter
covariance (parity: /root/reference/src/covariance_update_functions/).
Each update provides:

  * ``apply(cov, eps)``        — full-covariance form,
  * ``apply_sqrt(chol, eps)``  — square-root form via a QR sum,
  * ``sample(key, eps)``       — a draw from N(0, apply(0, eps)).

TPU-first delta: ``sample`` exploits the known structure of each update
(diagonal / rank-1) for an exact O(n) draw; the reference instead builds the
dense covariance and calls ``random.multivariate_normal(method="svd")`` per
particle (src/filters/particle_filter.py:96-103) — an [n, n] SVD per particle
per step that XLA executes as slow batched scalar loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.ops.sqrt_linalg import sqrt_sum


@dataclasses.dataclass(frozen=True)
class DiagonalUpdate:
    """cov + diag((scale * eps)^2)."""

    scale: float = 1.0

    def apply(self, cov: jax.Array, eps: jax.Array) -> jax.Array:
        return cov + jnp.diag((self.scale * eps) ** 2)

    def apply_sqrt(self, chol: jax.Array, eps: jax.Array) -> jax.Array:
        return sqrt_sum(chol, jnp.diag(self.scale * eps))

    def sample(self, key: jax.Array, eps: jax.Array) -> jax.Array:
        return self.scale * eps * jax.random.normal(key, eps.shape, eps.dtype)


@dataclasses.dataclass(frozen=True)
class OuterUpdate:
    """cov + (scale * eps)(scale * eps)^T  (rank-1)."""

    scale: float = 1.0

    def apply(self, cov: jax.Array, eps: jax.Array) -> jax.Array:
        v = self.scale * eps
        return cov + jnp.outer(v, v)

    def apply_sqrt(self, chol: jax.Array, eps: jax.Array) -> jax.Array:
        v = self.scale * eps
        # vv^T has sqrt factor (v v^T)/||v|| (rank-1 column scaled to norm).
        # Guard eps = 0 (exact steps, t=0): the factor is 0 there, and the
        # unguarded v/||v|| has a NaN gradient at the origin even when the
        # primal is finite (the reference inherits this flaw, outer.py:56-60).
        norm2 = v @ v
        safe = jnp.where(norm2 > 0.0, norm2, 1.0)
        factor = jnp.where(norm2 > 0.0, jnp.outer(v, v) / jnp.sqrt(safe), 0.0)
        return sqrt_sum(chol, factor)

    def sample(self, key: jax.Array, eps: jax.Array) -> jax.Array:
        # Exact rank-1 draw: z * v with scalar z ~ N(0, 1).
        z = jax.random.normal(key, (), eps.dtype)
        return (self.scale * eps) * z


@dataclasses.dataclass(frozen=True)
class StaticDiagonalUpdate:
    """cov + sigma^2 * I — the Conrad-style fixed-noise baseline. ``sigma``
    is a runtime argument so one compilation serves a noise-level sweep."""

    scale: float = 1.0

    def apply(self, sigma: jax.Array, cov: jax.Array, eps: jax.Array) -> jax.Array:
        del eps
        n = cov.shape[-1]
        return cov + sigma**2 * jnp.eye(n, dtype=cov.dtype)

    def apply_sqrt(self, sigma: jax.Array, chol: jax.Array, eps: jax.Array) -> jax.Array:
        del eps
        n = chol.shape[-1]
        return sqrt_sum(chol, sigma * jnp.eye(n, dtype=chol.dtype))

    def sample(self, sigma: jax.Array, key: jax.Array, eps: jax.Array) -> jax.Array:
        return sigma * jax.random.normal(key, eps.shape, eps.dtype)


COV_UPDATE_REGISTRY = {
    "DiagonalCovarianceUpdate": DiagonalUpdate,
    "OuterCovarianceUpdate": OuterUpdate,
    "StaticDiagonalCovarianceUpdate": StaticDiagonalUpdate,
}
