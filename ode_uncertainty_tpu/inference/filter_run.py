"""Probabilistic-solve drivers: unroll a filter over the time grid.

Equivalent of the reference's run_filter unroll (scripts/run_filter.py:
166-224) as jitted scan programs with chunked saving. Prediction-only runs
use an all-false flags vector, so one compiled program covers both modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ode_uncertainty_tpu.filters.particle import ParticleFilter, PFState
from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState, SqrtEKF
from ode_uncertainty_tpu.inference.observations import ObsModel
from ode_uncertainty_tpu.models.base import ODEModel
from ode_uncertainty_tpu.utils.scan import scan_save


def make_ekf_run(ekf: SqrtEKF, solver, model: ODEModel, num_steps: int, save_every: int = 1):
    """Returns jitted ``run(state0, params, q_sqrt, gamma_sqrt, obs) ->
    (final EKFState, trajectory EKFState with leading time axis)``."""
    predict = ekf.make_predict(solver, model.rhs)
    correct = ekf.make_correct()

    @jax.jit
    def run(state0: EKFState, params, q_sqrt, gamma_sqrt, obs: ObsModel):
        def step(state, idx):
            state = predict(state, params, q_sqrt, gamma_sqrt)
            y = obs.ys[obs.index_map[idx]]
            return lax.cond(
                obs.flags[idx],
                lambda s: correct(s, obs.H, y, obs.R_sqrt),
                lambda s: s,
                state,
            )

        return scan_save(step, state0, num_steps, save_every)

    return run


def make_ekf_run_static(ekf: SqrtEKF, solver, model: ODEModel, num_steps: int, save_every: int = 1):
    """Conrad-baseline trajectory: fixed-sigma process noise (traced sigma)."""
    predict = ekf.make_predict_static(solver, model.rhs)
    correct = ekf.make_correct()

    @jax.jit
    def run(state0: EKFState, params, sigma, obs: ObsModel):
        def step(state, idx):
            state = predict(state, params, sigma)
            y = obs.ys[obs.index_map[idx]]
            return lax.cond(
                obs.flags[idx],
                lambda s: correct(s, obs.H, y, obs.R_sqrt),
                lambda s: s,
                state,
            )

        return scan_save(step, state0, num_steps, save_every)

    return run


def make_dense_run(flt, solver, model: ODEModel, num_steps: int, save_every: int = 1):
    """Trajectory driver for the dense-covariance filters (DenseEKF / UKF):
    same loop as :func:`make_ekf_run` with full-covariance noise arguments."""
    predict = flt.make_predict(solver, model.rhs)
    correct = flt.make_correct()

    @jax.jit
    def run(state0, params, q, gamma, obs: ObsModel):
        r = obs.R_sqrt @ obs.R_sqrt.T

        def step(state, idx):
            state = predict(state, params, q, gamma)
            y = obs.ys[obs.index_map[idx]]
            return lax.cond(
                obs.flags[idx],
                lambda s: correct(s, obs.H, y, r),
                lambda s: s,
                state,
            )

        return scan_save(step, state0, num_steps, save_every)

    return run


def make_gmm_run(gmm, solver, model: ODEModel, num_steps: int, save_every: int = 1):
    """Trajectory driver for the Gaussian-mixture sqrt-EKF; stores the full
    component bank plus the mixture moments per saved step."""
    predict = gmm.make_predict(solver, model.rhs)
    correct = gmm.make_correct()

    @jax.jit
    def run(state0, params, q_sqrt, gamma_sqrt, obs: ObsModel):
        def step(state, idx):
            state = predict(state, params, q_sqrt, gamma_sqrt)
            y = obs.ys[obs.index_map[idx]]
            return lax.cond(
                obs.flags[idx],
                lambda s: correct(s, obs.H, y, obs.R_sqrt),
                lambda s: s,
                state,
            )

        return scan_save(step, state0, num_steps, save_every)

    return run


def make_pf_run(pf: ParticleFilter, solver, model: ODEModel, num_steps: int, save_every: int = 1):
    """Particle-perturbation trajectory (prediction only, like the
    reference's ParticleFilter which has no correct step)."""
    predict = pf.make_predict(solver, model.rhs)

    @jax.jit
    def run(state0: PFState, params):
        def step(state, idx):
            del idx
            return predict(state, params)

        return scan_save(step, state0, num_steps, save_every)

    return run
