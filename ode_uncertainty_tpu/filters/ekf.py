"""Dense-covariance extended Kalman filter (extension).

Modernized equivalent of the reference's deprecated dense EKF
(/root/reference/src/filters/deprecated/ekf.py): full-covariance propagation
through the solver-step Jacobian with Joseph-form correction. The sqrt filter
(:mod:`ode_uncertainty_tpu.filters.sqrt_ekf`) is the production path; this
variant exists for parity, cross-validation and cheap low-precision runs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from ode_uncertainty_tpu.filters.cov_updates import DiagonalUpdate
from ode_uncertainty_tpu.ops.linearize import push_sqrt


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseEKFState:
    t: jax.Array  # []
    x: jax.Array  # [N, D]
    eps: jax.Array  # [N, D]
    P: jax.Array  # [n, n] full covariance
    y_hat: jax.Array  # [L]
    S: jax.Array  # [L, L]

    def replace(self, **kw) -> "DenseEKFState":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DenseEKF:
    """Full-covariance EKF."""

    cov_update: object = DiagonalUpdate()

    def init_state(self, t0, x0: jax.Array, p0: jax.Array, obs_dim: int) -> DenseEKFState:
        dtype = x0.dtype
        return DenseEKFState(
            t=jnp.asarray(t0, dtype),
            x=x0,
            eps=jnp.zeros_like(x0),
            P=p0.astype(dtype),
            y_hat=jnp.zeros((obs_dim,), dtype),
            S=jnp.zeros((obs_dim, obs_dim), dtype),
        )

    def make_predict(self, solver, rhs: Callable):
        cov_update = self.cov_update

        def predict(state: DenseEKFState, params, q: jax.Array, gamma: jax.Array) -> DenseEKFState:
            shape = state.x.shape
            n = state.x.size

            def step_flat(xf):
                x_next, eps = solver.step(rhs, params, state.t, xf.reshape(shape))
                return x_next.reshape(n), eps.reshape(n)

            # Jacobian applied to the identity = dense J; same linearize pass
            # the sqrt filter uses.
            (x_next_f, eps_f), jac = push_sqrt(
                step_flat, state.x.reshape(n), jnp.eye(n, dtype=state.x.dtype)
            )
            p_pred = jac @ state.P @ jac.T
            p_new = cov_update.apply(p_pred, eps_f) + gamma * q
            return state.replace(
                t=state.t + solver.h,
                x=x_next_f.reshape(shape),
                eps=eps_f.reshape(shape),
                P=p_new,
            )

        return predict

    def make_correct(self):
        def correct(state: DenseEKFState, H, y, r: jax.Array) -> DenseEKFState:
            n = state.P.shape[-1]
            xf = state.x.reshape(n)
            y_hat = H @ xf
            s = H @ state.P @ H.T + r + 1e-8 * jnp.eye(H.shape[0], dtype=state.P.dtype)
            k = cho_solve(cho_factor(s, lower=True), H @ state.P).T
            x_new = xf + k @ (y - y_hat)
            a = jnp.eye(n, dtype=state.P.dtype) - k @ H
            p_new = a @ state.P @ a.T + k @ r @ k.T  # Joseph form
            return state.replace(
                x=x_new.reshape(state.x.shape), P=p_new, y_hat=y_hat, S=s
            )

        return correct
