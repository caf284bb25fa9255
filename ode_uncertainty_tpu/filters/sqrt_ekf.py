"""Square-root extended Kalman filter over a one-step ODE solver.

Parity: /root/reference/src/filters/sqrt_ekf.py. Algorithm is identical
(JVP pushforward of the covariance sqrt through the solver step; QR-sum
process-noise injection; Joseph-form sqrt correction); the mechanics are
redesigned TPU-first:

  * **unbatched state, no ``[1]`` axes** — the reference bolts a leading
    broadcast axis onto every state entry (sqrt_ekf.py:69-84); here
    :class:`EKFState` is a registered dataclass pytree written for a single
    chain and lifted over restarts/particles with ``vmap``.
  * **noise configuration out of the state** — ``Q_sqrt``/``gamma_sqrt``/
    ``R_sqrt``/``H`` are function arguments, so the tempering loop can trace
    ``gamma`` (one compilation for all stages; the reference re-jits and
    calls ``jax.clear_caches()`` per stage, run_parameter_estimation.py:656)
    and the ``lax.cond`` on Q stays unbatched under ``vmap``.
  * **one linearize pass** — ``jax.linearize`` evaluates the step once and
    pushes all covariance columns through the linear map (reference: vmapped
    ``jax.jvp`` re-packing primals per column, utils.py:72-79).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ode_uncertainty_tpu.filters.cov_updates import DiagonalUpdate
from ode_uncertainty_tpu.ops.linearize import push_sqrt
from ode_uncertainty_tpu.ops.sqrt_linalg import cho_solve_sqrt, sqrt_sum

_Q_ACTIVE_THRESHOLD = 1e-16  # matches reference sqrt_ekf.py:109


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EKFState:
    """Per-chain filter state (n = N * D flat state size, L = obs dim)."""

    t: jax.Array  # []
    x: jax.Array  # [N, D] mean
    eps: jax.Array  # [N, D] last local-error estimate
    P_sqrt: jax.Array  # [n, n] covariance sqrt factor
    y_hat: jax.Array  # [L] last predicted observation
    S_sqrt: jax.Array  # [L, L] last innovation covariance sqrt

    def replace(self, **kw) -> "EKFState":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SqrtEKF:
    """Square-root EKF configuration.

    Attributes:
        cov_update: local-error covariance update (used when process noise Q
            is inactive and local-error updates are enabled).
        disable_cov_update: if True, the local-error term is not injected
            (tempering-only process noise), matching the reference flag.
    """

    cov_update: object = DiagonalUpdate()
    disable_cov_update: bool = False

    def init_state(self, t0, x0: jax.Array, p0_sqrt: jax.Array, obs_dim: int) -> EKFState:
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
        """Returns ``predict(state, params, q_sqrt, gamma_sqrt) -> EKFState``.

        q_sqrt: [n, n] tempering process-noise sqrt; gamma_sqrt: [] tempering
        scale. Both traced, shared across a vmapped batch.
        """
        disable = self.disable_cov_update
        cov_update = self.cov_update

        def predict(state: EKFState, params, q_sqrt, gamma_sqrt) -> EKFState:
            shape = state.x.shape
            n = state.x.size

            def step_flat(xf):
                x_next, eps = solver.step(rhs, params, state.t, xf.reshape(shape))
                return x_next.reshape(n), eps.reshape(n)

            (x_next_f, eps_f), p_pred = push_sqrt(step_flat, state.x.reshape(n), state.P_sqrt)

            # Guard on the EFFECTIVE noise gamma*Q, not Q alone (the
            # reference conditions on Q_sqrt only, sqrt_ekf.py:109). At the
            # final tempering stage gamma == 0 exactly; QR-summing with the
            # zero block is well-defined forward but its backward pass has
            # 1/(v'v)^2 Householder terms that overflow float32 when the
            # surviving columns are ~1e-10 — the gradient turns NaN and the
            # optimizer's last stage dies on lane one (measured, LV2 f32).
            qg = gamma_sqrt * q_sqrt
            q_active = jnp.any(jnp.abs(qg) >= _Q_ACTIVE_THRESHOLD)
            if disable:
                p_new = lax.cond(
                    q_active,
                    lambda p: sqrt_sum(p, qg),
                    lambda p: p,
                    p_pred,
                )
            else:
                p_new = lax.cond(
                    q_active,
                    lambda p: sqrt_sum(qg, jnp.diag(eps_f), p),
                    lambda p: cov_update.apply_sqrt(p, eps_f),
                    p_pred,
                )

            return state.replace(
                t=state.t + solver.h,
                x=x_next_f.reshape(shape),
                eps=eps_f.reshape(shape),
                P_sqrt=p_new,
            )

        return predict

    def make_predict_static(self, solver, rhs: Callable):
        """Conrad-baseline predict: fixed sigma^2*I process noise per step.

        Returns ``predict(state, params, sigma) -> EKFState`` (sigma traced,
        so a 500-level calibration sweep is one compilation + vmap; parity:
        scripts/run_calibration_conrad_baseline_calibration.py:126-158).
        """

        def predict(state: EKFState, params, sigma) -> EKFState:
            shape = state.x.shape
            n = state.x.size

            def step_flat(xf):
                x_next, eps = solver.step(rhs, params, state.t, xf.reshape(shape))
                return x_next.reshape(n), eps.reshape(n)

            (x_next_f, eps_f), p_pred = push_sqrt(step_flat, state.x.reshape(n), state.P_sqrt)
            p_new = sqrt_sum(p_pred, sigma * jnp.eye(n, dtype=p_pred.dtype))
            return state.replace(
                t=state.t + solver.h,
                x=x_next_f.reshape(shape),
                eps=eps_f.reshape(shape),
                P_sqrt=p_new,
            )

        return predict

    def make_correct(self):
        """Returns ``correct(state, H, y, R_sqrt) -> EKFState`` (Joseph form)."""

        def correct(state: EKFState, H: jax.Array, y: jax.Array, r_sqrt: jax.Array) -> EKFState:
            n = state.P_sqrt.shape[-1]
            xf = state.x.reshape(n)
            p = state.P_sqrt

            y_hat = H @ xf
            s_sqrt = sqrt_sum(H @ p, r_sqrt)

            def gain(_):
                # K = P H^T S^{-1}  computed as (S^{-1} H P P^T)^T.
                return (cho_solve_sqrt(s_sqrt, H) @ p @ p.T).T

            k = lax.cond(
                jnp.all(jnp.abs(s_sqrt) < _Q_ACTIVE_THRESHOLD),
                lambda _: jnp.zeros((n, H.shape[0]), p.dtype),
                gain,
                None,
            )

            x_new = xf + k @ (y - y_hat)
            a = jnp.eye(n, dtype=p.dtype) - k @ H
            p_new = sqrt_sum(a @ p, k @ r_sqrt)

            return state.replace(
                x=x_new.reshape(state.x.shape),
                P_sqrt=p_new,
                y_hat=y_hat,
                S_sqrt=s_sqrt,
            )

        return correct
