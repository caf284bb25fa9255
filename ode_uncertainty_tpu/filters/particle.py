"""Particle (perturbation) filter — Conrad-style stochastic ODE solutions.

Parity: /root/reference/src/filters/particle_filter.py. Each step advances
M particles through the solver and perturbs them with zero-mean noise whose
covariance is the local-error covariance update evaluated at that particle's
``eps``; particle 0 stays noise-free as the deterministic reference
trajectory. There is no correction/resampling step (the reference never
implements one).

TPU-first deltas:
  * noise draws use the covariance update's structure-aware ``sample``
    (O(n) per particle) instead of building dense [n, n] covariances and
    running an SVD-based multivariate-normal per particle per step;
  * the particle axis is an explicit leading vmap axis on a per-chain state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.filters.cov_updates import DiagonalUpdate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PFState:
    """Particle ensemble state."""

    t: jax.Array  # []
    x: jax.Array  # [M, N, D]
    eps: jax.Array  # [M, N, D]
    key: jax.Array  # PRNG key

    def replace(self, **kw) -> "PFState":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ParticleFilter:
    """Prediction-only perturbation sampler."""

    cov_update: object = DiagonalUpdate()
    num_particles: int = 100

    def init_state(self, t0, x0: jax.Array, key: jax.Array) -> PFState:
        m = self.num_particles
        return PFState(
            t=jnp.asarray(t0, x0.dtype),
            x=jnp.broadcast_to(x0[None], (m,) + x0.shape),
            eps=jnp.zeros((m,) + x0.shape, x0.dtype),
            key=key,
        )

    def make_predict(self, solver, rhs: Callable):
        """Returns ``predict(state, params) -> PFState``."""
        cov_update = self.cov_update
        m = self.num_particles

        def predict(state: PFState, params) -> PFState:
            key, key_noise = jax.random.split(state.key)

            x_next, eps = jax.vmap(lambda x: solver.step(rhs, params, state.t, x))(state.x)

            noise_keys = jax.random.split(key_noise, m)
            flat_eps = eps.reshape(m, -1)
            noise = jax.vmap(cov_update.sample)(noise_keys, flat_eps)
            noise = noise.reshape(eps.shape).at[0].set(0.0)

            return state.replace(
                t=state.t + solver.h,
                x=x_next + noise,
                eps=eps,
                key=key,
            )

        return predict

    def make_predict_static(self, solver, rhs: Callable, static_update):
        """Conrad-baseline variant: fixed-sigma perturbations.

        Returns ``predict(state, params, sigma) -> PFState``.
        """
        m = self.num_particles

        def predict(state: PFState, params, sigma) -> PFState:
            key, key_noise = jax.random.split(state.key)
            x_next, eps = jax.vmap(lambda x: solver.step(rhs, params, state.t, x))(state.x)
            noise_keys = jax.random.split(key_noise, m)
            flat_eps = eps.reshape(m, -1)
            noise = jax.vmap(lambda k, e: static_update.sample(sigma, k, e))(
                noise_keys, flat_eps
            )
            noise = noise.reshape(eps.shape).at[0].set(0.0)
            return state.replace(t=state.t + solver.h, x=x_next + noise, eps=eps, key=key)

        return predict
