"""Unscented Kalman filters (dense and square-root variants; extensions).

Modernized equivalents of the reference's deprecated UKF / UKF_SQRT
(/root/reference/src/filters/deprecated/{ukf,ukf_sqrt}.py): an augmented
unscented transform over (state ⊕ process-noise) propagates sigma points
through the solver step and injects local-error noise per sigma point, so
the noise enters the transform nonlinearly (the reference's construction).

The sqrt variant keeps a triangular factor throughout: the predicted factor
comes from a QR of the weighted sigma deviations plus a rank-1 Cholesky
update for the (possibly negative) center-point weight — the reference used
``tfp.math.cholesky_update``; here :mod:`ode_uncertainty_tpu.ops.chol_update`.

Correction assumes the linear measurement model used by every shipped
experiment (y = H x + r); the UT then coincides with the exact Kalman update,
so it is computed exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from ode_uncertainty_tpu.filters.cov_updates import DiagonalUpdate
from ode_uncertainty_tpu.filters.ekf import DenseEKFState
from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState
from ode_uncertainty_tpu.ops.chol_update import chol_update
from ode_uncertainty_tpu.ops.sqrt_linalg import cho_solve_sqrt, sqrt_sum, tria


def _ut_weights(n_aug: int, alpha: float, beta: float, kappa: float, dtype):
    lam = alpha**2 * (n_aug + kappa) - n_aug
    w_m0 = lam / (n_aug + lam)
    w_c0 = w_m0 + (1.0 - alpha**2 + beta)
    w_i = 1.0 / (2.0 * (n_aug + lam))
    w_m = jnp.concatenate([jnp.array([w_m0], dtype), jnp.full((2 * n_aug,), w_i, dtype)])
    w_c = jnp.concatenate([jnp.array([w_c0], dtype), jnp.full((2 * n_aug,), w_i, dtype)])
    return w_m, w_c, jnp.asarray(n_aug + lam, dtype)


@dataclasses.dataclass(frozen=True)
class UKF:
    """Dense augmented-state unscented Kalman filter."""

    cov_update: object = DiagonalUpdate()
    alpha: float = 0.1
    beta: float = 2.0
    kappa: float | None = None

    def init_state(self, t0, x0, p0, obs_dim: int) -> DenseEKFState:
        dtype = x0.dtype
        return DenseEKFState(
            t=jnp.asarray(t0, dtype),
            x=x0,
            eps=jnp.zeros_like(x0),
            P=p0.astype(dtype),
            y_hat=jnp.zeros((obs_dim,), dtype),
            S=jnp.zeros((obs_dim, obs_dim), dtype),
        )

    def _sigma_points(self, xf, chol_aug, scale):
        """[2*n_aug+1, n_aug] augmented sigma points around (x, 0)."""
        n = xf.shape[-1]
        n_aug = chol_aug.shape[-1]
        m0 = jnp.concatenate([xf, jnp.zeros(n_aug - n, xf.dtype)])
        offs = jnp.sqrt(scale) * chol_aug.T  # rows are directions
        return jnp.concatenate([m0[None], m0[None] + offs, m0[None] - offs], axis=0)

    def _propagate(self, solver, rhs, params, state, chol_state):
        """Shared augmented-UT propagation: returns (pts_next [K, n], w_m,
        w_c, eps_center [n])."""
        shape = state.x.shape
        n = state.x.size
        n_aug = 2 * n
        kappa = 3.0 - n_aug if self.kappa is None else self.kappa
        w_m, w_c, scale = _ut_weights(n_aug, self.alpha, self.beta, kappa, state.x.dtype)

        chol_aug = jnp.zeros((n_aug, n_aug), state.x.dtype)
        chol_aug = chol_aug.at[:n, :n].set(chol_state)
        chol_aug = chol_aug.at[n:, n:].set(jnp.eye(n, dtype=state.x.dtype))

        pts = self._sigma_points(state.x.reshape(n), chol_aug, scale)  # [K, 2n]
        xs, zs = pts[:, :n], pts[:, n:]

        def step_one(xf):
            x_next, eps = solver.step(rhs, params, state.t, xf.reshape(shape))
            return x_next.reshape(n), eps.reshape(n)

        xs_next, eps_all = jax.vmap(step_one)(xs)
        # local-error noise enters through the transform: each point is
        # displaced by its own noise-sqrt applied to its noise coordinates
        cov_update = self.cov_update

        def noise_of(eps_i, z_i):
            zero = jnp.zeros((n, n), eps_i.dtype)
            return cov_update.apply_sqrt(zero, eps_i) @ z_i

        xs_next = xs_next + jax.vmap(noise_of)(eps_all, zs)
        return xs_next, w_m, w_c, eps_all[0]

    def make_predict(self, solver, rhs: Callable):
        def predict(state: DenseEKFState, params, q, gamma) -> DenseEKFState:
            n = state.x.size
            jitter = 1e-16 * jnp.eye(n, dtype=state.P.dtype)
            chol_state = jnp.linalg.cholesky(state.P + jitter)
            xs_next, w_m, w_c, eps0 = self._propagate(solver, rhs, params, state, chol_state)
            mean = w_m @ xs_next
            dev = xs_next - mean[None, :]
            p_new = jnp.einsum("k,ki,kj->ij", w_c, dev, dev) + gamma * q
            return state.replace(
                t=state.t + solver.h,
                x=mean.reshape(state.x.shape),
                eps=eps0.reshape(state.x.shape),
                P=p_new,
            )

        return predict

    def make_correct(self):
        def correct(state: DenseEKFState, H, y, r) -> DenseEKFState:
            n = state.P.shape[-1]
            xf = state.x.reshape(n)
            y_hat = H @ xf
            s = H @ state.P @ H.T + r + 1e-8 * jnp.eye(H.shape[0], dtype=state.P.dtype)
            k = cho_solve(cho_factor(s, lower=True), H @ state.P).T
            x_new = xf + k @ (y - y_hat)
            a = jnp.eye(n, dtype=state.P.dtype) - k @ H
            p_new = a @ state.P @ a.T + k @ r @ k.T
            return state.replace(x=x_new.reshape(state.x.shape), P=p_new, y_hat=y_hat, S=s)

        return correct


@dataclasses.dataclass(frozen=True)
class SqrtUKF(UKF):
    """Square-root augmented UKF: triangular covariance factor throughout."""

    def init_state(self, t0, x0, p0_sqrt, obs_dim: int) -> EKFState:
        dtype = x0.dtype
        return EKFState(
            t=jnp.asarray(t0, dtype),
            x=x0,
            eps=jnp.zeros_like(x0),
            P_sqrt=p0_sqrt.astype(dtype),
            y_hat=jnp.zeros((obs_dim,), dtype),
            S_sqrt=jnp.zeros((obs_dim, obs_dim), dtype),
        )

    def make_predict(self, solver, rhs: Callable):
        def predict(state: EKFState, params, q_sqrt, gamma_sqrt) -> EKFState:
            xs_next, w_m, w_c, eps0 = self._propagate(
                solver, rhs, params, state, state.P_sqrt
            )
            mean = w_m @ xs_next
            dev = xs_next - mean[None, :]
            # QR over the sqrt(w)-scaled non-center deviations (+ tempering
            # noise), then rank-1 update for the center weight (sign of w_c0).
            wing = jnp.sqrt(w_c[1:, None]) * dev[1:]  # [2n_aug, n]
            p_sqrt = tria(jnp.concatenate([wing.T, gamma_sqrt * q_sqrt], axis=-1))
            p_sqrt = chol_update(p_sqrt, dev[0], w_c[0])
            return state.replace(
                t=state.t + solver.h,
                x=mean.reshape(state.x.shape),
                eps=eps0.reshape(state.x.shape),
                P_sqrt=p_sqrt,
            )

        return predict

    def make_correct(self):
        def correct(state: EKFState, H, y, r_sqrt) -> EKFState:
            n = state.P_sqrt.shape[-1]
            xf = state.x.reshape(n)
            y_hat = H @ xf
            s_sqrt = sqrt_sum(H @ state.P_sqrt, r_sqrt)
            k = (cho_solve_sqrt(s_sqrt, H) @ state.P_sqrt @ state.P_sqrt.T).T
            x_new = xf + k @ (y - y_hat)
            a = jnp.eye(n, dtype=state.P_sqrt.dtype) - k @ H
            p_new = sqrt_sum(a @ state.P_sqrt, k @ r_sqrt)
            return state.replace(
                x=x_new.reshape(state.x.shape), P_sqrt=p_new, y_hat=y_hat, S_sqrt=s_sqrt
            )

        return correct
