"""Calibration comparison: static process-noise sweep vs local-error noise.

Computes the filter's mean innovation NLL for a sweep of Conrad-style fixed
noise levels and for the local-error covariance update (parity:
/root/reference/scripts/run_calibration_conrad_baseline_calibration.py).
The noise-level axis is one vmapped batch of a single compiled program; the
reference scans 500 levels sequentially.

NLL convention follows the reference here: per-observation **mean** with
NaN-to-zero sanitation (calibration script :222 uses mean, unlike the
estimation objective's sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState, SqrtEKF
from ode_uncertainty_tpu.inference.observations import ObsModel
from ode_uncertainty_tpu.models.base import ODEModel
from ode_uncertainty_tpu.ops.sqrt_linalg import nll_gaussian_sqrt


def make_calibration(
    ekf: SqrtEKF, solver, model: ODEModel, obs: ObsModel, state0: EKFState, num_steps: int
):
    """Returns jitted ``calibrate(params, noise_levels [K]) ->
    (nll_static [K], nll_local_error [])``."""
    predict_static = ekf.make_predict_static(solver, model.rhs)
    predict_local = ekf.make_predict(solver, model.rhs)
    correct = ekf.make_correct()

    def mean_nll(predict_one):
        def step(state, idx):
            state = predict_one(state)
            y = obs.ys[obs.index_map[idx]]

            def do_correct(s):
                s2 = correct(s, obs.H, y, obs.R_sqrt)
                return s2, nll_gaussian_sqrt(y, s2.y_hat, s2.S_sqrt)

            return lax.cond(
                obs.flags[idx], do_correct, lambda s: (s, jnp.zeros((), state.x.dtype)), state
            )

        _, nlgs = lax.scan(step, state0, jnp.arange(num_steps))
        return jnp.mean(jnp.nan_to_num(nlgs))

    @jax.jit
    def calibrate(params, noise_levels: jax.Array):
        def static_nll(sigma):
            return mean_nll(lambda s: predict_static(s, params, sigma))

        nll_static = jax.vmap(static_nll)(noise_levels)
        n = state0.x.size
        zero_q = jnp.zeros((n, n), state0.x.dtype)
        nll_local = mean_nll(
            lambda s: predict_local(s, params, zero_q, jnp.zeros((), state0.x.dtype))
        )
        return nll_static, nll_local

    return calibrate
