"""Inference-stack tests: on-device projected L-BFGS, filter NLL gradients,
tempered estimation end-to-end on Lotka-Volterra, tRMSE, calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from ode_uncertainty_tpu import models, solvers
from ode_uncertainty_tpu.filters import DiagonalUpdate, SqrtEKF
from ode_uncertainty_tpu.inference import (
    LinearDecaySchedule,
    lbfgs_box,
    make_calibration,
    make_nll,
    make_nll_landscape,
    make_obs_model,
    make_param_spec,
    make_tempered_estimator,
    make_trmse_evaluator,
)
from ode_uncertainty_tpu.ops import const_diag


# ------------------------------------------------------------------- L-BFGS
def test_lbfgs_quadratic_interior():
    a = jnp.diag(jnp.array([1.0, 10.0, 100.0]))
    b = jnp.array([0.3, 0.4, 0.5])

    def f(x):
        return 0.5 * x @ a @ x - b @ x

    sol = jnp.linalg.solve(a, b)  # interior of [0,1]^3
    res = lbfgs_box(f, jnp.array([0.9, 0.9, 0.9]), 0.0, 1.0, max_iter=100, tol=1e-8)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(sol), atol=1e-7)


def test_lbfgs_active_box_constraint():
    def f(x):
        return jnp.sum((x - jnp.array([1.5, -0.2])) ** 2)

    res = lbfgs_box(f, jnp.array([0.5, 0.5]), 0.0, 1.0, max_iter=100, tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 0.0], atol=1e-8)
    assert bool(res.converged)


def test_lbfgs_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    res = lbfgs_box(f, jnp.array([0.1, 0.8]), -2.0, 2.0, max_iter=400, tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_lbfgs_vmap_batched():
    def f(x):
        return jnp.sum((x - 0.3) ** 2) + jnp.sin(5 * x[0]) * 0.01

    x0s = random.uniform(random.key(0), (16, 4))
    res = jax.vmap(lambda x0: lbfgs_box(f, x0, 0.0, 1.0, max_iter=100, tol=1e-8))(x0s)
    assert res.x.shape == (16, 4)
    # all lanes reach the same global minimum of this strictly convex-ish fn
    np.testing.assert_allclose(np.asarray(res.f), float(res.f[0]), rtol=1e-9)
    assert bool(jnp.all(res.converged))


def test_lbfgs_handles_nan_objective():
    """NaN regions act like line-search walls, not crashes."""

    def f(x):
        val = jnp.sum((x - 0.4) ** 2)
        return jnp.where(x[0] > 0.9, jnp.nan, val)

    res = lbfgs_box(f, jnp.array([0.5, 0.5]), 0.0, 1.0, max_iter=50)
    assert bool(jnp.isfinite(res.f))
    np.testing.assert_allclose(np.asarray(res.x), [0.4, 0.4], atol=1e-5)


# ---------------------------------------------------------------- problem rig
def _lv_problem(tN=10.0, h=0.05, obs_every=10, dtype=jnp.float64):
    """Small Lotka-Volterra estimation rig with synthetic noisy observations."""
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=h)
    num_steps = int(round(tN / h))
    x0 = jnp.array([[1.0, 1.0]], dtype)

    gt = solvers.solve(sol, m, 0.0, x0, num_steps)
    idx = np.arange(obs_every, num_steps + 1, obs_every)
    ts_y = np.asarray(gt["t"])[idx]
    rng = np.random.default_rng(0)
    obs_noise_var = 0.01
    ys_raw = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys_raw = ys_raw + obs_noise_var**0.5 * rng.standard_normal(ys_raw.shape)

    obs = make_obs_model(
        np.eye(2), ts_y, ys_raw, obs_noise_var, 0.0, h, num_steps, dtype=dtype
    )
    spec = make_param_spec(
        m.params,
        {"alpha": (0.1, 5.0), "beta": (0.1, 5.0), "gamma": (0.1, 5.0), "delta": (0.1, 5.0)},
        {"alpha": True, "beta": True, "gamma": False, "delta": False},
        dtype=dtype,
    )
    ekf = SqrtEKF(cov_update=DiagonalUpdate(), disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-12, dtype), 2)
    nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
    return m, sol, spec, ekf, obs, state0, nll, num_steps, x0


def test_nll_minimum_near_true_params():
    _, _, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    q = jnp.zeros((2, 2))
    g0 = jnp.asarray(0.0)
    p_true = spec.defaults_norm_opt()
    nll_true = float(nll(p_true, q, g0))
    for delta in [0.05, -0.05]:
        p_off = jnp.clip(p_true + delta, 0.0, 1.0)
        assert float(nll(p_off, q, g0)) > nll_true


def test_nll_gradient_matches_finite_differences():
    _, _, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    q = jnp.diag(jnp.array([1.0, 1.0]))
    gam = jnp.asarray(10.0**-2) ** 0.5
    p = spec.defaults_norm_opt() + jnp.array([0.03, -0.02])
    g = jax.grad(lambda z: nll(z, q, gam))(p)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros_like(p).at[i].set(eps)
        fd = (float(nll(p + e, q, gam)) - float(nll(p - e, q, gam))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-4, atol=1e-6)


def test_nll_initial_state_parametrized():
    """With the flag on, the filter's initial state is rebuilt from the
    candidate parameters (reference run_parameter_estimation.py:744-748):
    for Hodgkin-Huxley the steady-state gating init depends on V_T, so the
    NLL must change relative to the fixed-x0 variant away from the truth,
    agree at the truth, and stay differentiable."""
    dtype = jnp.float64
    m = models.hodgkin_huxley("reduced-4")
    sol = solvers.kvaerno3(step_size=0.02)
    num_steps = 80
    x0_raw = jnp.array([[-70.0]], dtype)
    x0 = m.build_initial_value(x0_raw, m.params).astype(dtype)
    gt = solvers.solve(sol, m, 0.0, x0, num_steps)
    idx = np.arange(5, num_steps + 1, 5)
    rng = np.random.default_rng(1)
    ys = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys = ys + 0.1 * rng.standard_normal(ys.shape)
    h_mat = np.zeros((1, 4))
    h_mat[0, 0] = 1.0
    obs = make_obs_model(h_mat, np.asarray(gt["t"])[idx], ys, 0.1, 0.0, 0.02, num_steps, dtype=dtype)
    spec = make_param_spec(
        m.params, {k: (-110.0, 5000.0) for k in m.params}, {"V_T": True}, dtype=dtype
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(4, 1e-12, dtype), 1)

    nll_fixed = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
    nll_param = make_nll(
        m, sol, ekf, spec, obs, state0, num_steps,
        x0_raw=x0_raw, initial_state_parametrized=True,
    )
    q = jnp.zeros((4, 4), dtype)
    g0 = jnp.asarray(0.0, dtype)
    p_true = spec.defaults_norm_opt()
    # identical at the truth (rebuilt x0 == stored x0)
    np.testing.assert_allclose(
        float(nll_param(p_true, q, g0)), float(nll_fixed(p_true, q, g0)), rtol=1e-12
    )
    # away from the truth the rebuilt initial state changes the NLL
    p_off = p_true + 0.02
    v_fixed, v_param = float(nll_fixed(p_off, q, g0)), float(nll_param(p_off, q, g0))
    assert np.isfinite(v_fixed) and np.isfinite(v_param)
    assert abs(v_fixed - v_param) > 1e-6
    grad = jax.grad(lambda z: nll_param(z, q, g0))(p_off)
    assert np.isfinite(np.asarray(grad)).all()


def test_nll_parameter_sensitivity():
    """parameter_sensitivity derives per-state process-noise weights from
    the parameter Jacobian of one solver step (reference
    run_parameter_estimation.py:760-769); the NLL must differ from the
    externally-weighted variant at nonzero gamma and stay differentiable."""
    _, _, spec, ekf, obs, state0, nll_plain, num_steps, x0 = _lv_problem()
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.05)
    nll_sens = make_nll(
        m, sol, ekf, spec, obs, state0, num_steps, parameter_sensitivity=True
    )
    q = jnp.diag(jnp.ones(2))
    gam = jnp.asarray(1e-2) ** 0.5
    p = spec.defaults_norm_opt() + jnp.array([0.03, -0.02])
    v_plain, v_sens = float(nll_plain(p, q, gam)), float(nll_sens(p, q, gam))
    assert np.isfinite(v_plain) and np.isfinite(v_sens)
    assert abs(v_plain - v_sens) > 1e-9
    grad = jax.grad(lambda z: nll_sens(z, q, gam))(p)
    assert np.isfinite(np.asarray(grad)).all()


def test_nll_remat_matches_plain():
    m, sol, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    nll_r = make_nll(m, sol, ekf, spec, obs, state0, num_steps, remat=True)
    q = jnp.zeros((2, 2))
    p = spec.defaults_norm_opt()
    np.testing.assert_allclose(
        float(nll(p, q, jnp.asarray(0.0))), float(nll_r(p, q, jnp.asarray(0.0))), rtol=1e-12
    )
    g1 = jax.grad(lambda z: nll(z, q, jnp.asarray(0.0)))(p)
    g2 = jax.grad(lambda z: nll_r(z, q, jnp.asarray(0.0)))(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10)


def test_tempered_estimation_recovers_lv_params():
    """End-to-end: 8 random restarts, 3 tempering stages, on-device batched
    L-BFGS recovers (alpha, beta) = (1.5, 1.0)."""
    m, sol, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    q_sqrt = jnp.eye(2, dtype=jnp.float64)
    estimate = make_tempered_estimator(nll, spec, q_sqrt, max_iter=60, tol=1e-8)
    gammas = LinearDecaySchedule(init_noise_log=-2.0, decay_rate=3.0).gammas(3, final_zero=True)
    p0 = spec.sample_norm(random.key(1), 8).astype(jnp.float64)
    res = estimate(p0, gammas.astype(jnp.float64))

    assert res.params_optims.shape == (8, 3, 2)
    best = int(jnp.argmin(res.nll_optims[:, -1]))
    est = np.asarray(res.params_optims[best, -1])
    np.testing.assert_allclose(est, [1.5, 1.0], atol=0.05)
    # a majority of restarts should land near the truth
    final = np.asarray(res.params_optims[:, -1, :])
    hits = np.sum(np.all(np.abs(final - [1.5, 1.0]) < 0.1, axis=1))
    assert hits >= 4, f"only {hits}/8 restarts converged, {final}"


def test_trmse_zero_at_true_params():
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.05)
    spec = make_param_spec(
        m.params,
        {"alpha": (0.1, 5.0), "beta": (0.1, 5.0), "gamma": (0.1, 5.0), "delta": (0.1, 5.0)},
        {"alpha": True, "beta": True, "gamma": False, "delta": False},
        dtype=jnp.float64,
    )
    ev = make_trmse_evaluator(m, sol, spec, 0.0, jnp.array([[1.0, 1.0]]), 100)
    true_opt = spec.defaults_flat[spec.opt_indices][None, :]
    vals, mean, _ = ev(jnp.concatenate([true_opt, true_opt * 1.1]))
    np.testing.assert_allclose(float(vals[0]), 0.0, atol=1e-10)
    assert float(vals[1]) > 0.01


def test_calibration_sweep():
    m, sol, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    cal = make_calibration(ekf, sol, m, obs, state0, num_steps)
    levels = jnp.logspace(-6, 0, 25)
    nll_static, nll_local = cal(m.params, levels)
    assert nll_static.shape == (25,)
    assert bool(jnp.all(jnp.isfinite(nll_static)))
    assert bool(jnp.isfinite(nll_local))
    # huge artificial noise must be worse than the best static level
    assert float(nll_static.min()) < float(nll_static[-1])


def test_nll_landscape_grid():
    m, sol, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    landscape = make_nll_landscape(nll, jnp.zeros((2, 2)), batch_size=32)
    lin = jnp.linspace(0.1, 0.9, 7)
    grid = jnp.stack(jnp.meshgrid(lin, lin, indexing="ij"), -1).reshape(-1, 2)
    vals = landscape(grid, jnp.array([1e-2, 0.0]))
    assert vals.shape == (2, 49)
    assert bool(jnp.all(jnp.isfinite(vals)))
    # the NLL at the true parameters beats (almost) the entire coarse grid
    # (the deterministic gamma=0 landscape is multimodal, so we compare
    # values rather than demanding the argmin land in the true cell)
    p_true = spec.defaults_norm_opt()
    nll_true = float(nll(p_true, jnp.zeros((2, 2)), jnp.asarray(0.0)))
    frac_worse = float(jnp.mean(vals[1] > nll_true))
    assert frac_worse > 0.9, f"only {frac_worse:.2f} of grid points worse than truth"


def test_uniform_obs_fast_path_matches_generic():
    """The uniform-spacing fast path must agree with the generic per-step
    cond path in value and gradient."""
    from ode_uncertainty_tpu.inference import ObsModel

    m, sol, spec, ekf, obs, state0, nll_fast, num_steps, x0 = _lv_problem()
    from ode_uncertainty_tpu.inference.nll import make_nll

    nll_fast = make_nll(m, sol, ekf, spec, obs, state0, num_steps, fast_path=True)
    nll_nofast = make_nll(m, sol, ekf, spec, obs, state0, num_steps, fast_path=False)

    q = jnp.diag(jnp.array([1.0, 1.0]))
    gam = jnp.asarray(0.1)
    p = spec.defaults_norm_opt() + jnp.array([0.02, -0.03])
    v1 = float(nll_fast(p, q, gam))
    v2 = float(nll_nofast(p, q, gam))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    g1 = jax.grad(lambda z: nll_fast(z, q, gam))(p)
    g2 = jax.grad(lambda z: nll_nofast(z, q, gam))(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)


def test_tempered_estimator_stage_modes_agree():
    """scan-over-stages and host-looped stages produce identical results."""
    m, sol, spec, ekf, obs, state0, nll, num_steps, x0 = _lv_problem()
    q_sqrt = jnp.eye(2, dtype=jnp.float64)
    gammas = jnp.array([1e-2, 0.0])
    p0 = spec.sample_norm(random.key(5), 4).astype(jnp.float64)
    est_scan = make_tempered_estimator(nll, spec, q_sqrt, max_iter=15, tol=1e-8, stage_scan=True)
    est_loop = make_tempered_estimator(nll, spec, q_sqrt, max_iter=15, tol=1e-8, stage_scan=False)
    a = est_scan(p0, gammas)
    b = est_loop(p0, gammas)
    np.testing.assert_allclose(np.asarray(a.params_optims), np.asarray(b.params_optims), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.nll_optims), np.asarray(b.nll_optims), rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(a.num_lbfgs_iters), np.asarray(b.num_lbfgs_iters))
