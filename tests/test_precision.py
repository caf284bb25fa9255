"""f32-vs-f64 parity gates (VERDICT round-1 item 6; SURVEY §7.1.4 hard part).

The TPU-native path runs float32 while the reference is float64-only; these
tests enforce the precision claims instead of leaving them as README prose:

  * per-family trajectory agreement over the golden windows,
  * filter-NLL agreement on the estimation anchors,
  * end-to-end estimation equivalence on LV2: the f32 tempered optimizer
    must recover the same optimum and an equivalent tRMSE as f64.

Tolerances are per-family: stiff/chaotic systems amplify rounding faster.
All f32 programs here run on CPU; the verify flow cross-checks the same
numerics on real TPU hardware.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent / "golden"))

import generate  # noqa: E402

# name -> relative tolerance for ||x32 - x64|| / ||x64|| over the window.
# Chaotic (lorenz) and stiff-spiking (HH at stimulus onset) systems sit at
# the loose end; smooth systems hold ~1e-5.
_TRAJ_TOL = {
    "exponential": 1e-5,
    "logistic": 1e-5,
    "lotkavolterra": 1e-4,
    "lorenz": 5e-3,
    "pendulum": 1e-5,
    "vanderpol": 1e-4,
    "lcao": 1e-4,
    "rlc": 1e-4,
    "hodgkinhuxley_full": 5e-3,
    "hodgkinhuxley_r1": 5e-3,
    "hodgkinhuxley_r4": 5e-3,
    "hodgkinhuxley_c2_r4": 5e-3,
}

_CASES = {c[0]: c for c in generate.trajectory_cases()}


@pytest.mark.parametrize("name", sorted(_TRAJ_TOL))
def test_trajectory_f32_matches_f64(name):
    from ode_uncertainty_tpu import solvers

    _, m, sol, x0, t0, num_steps, save_every = _CASES[name]
    out = {}
    for dtype in (jnp.float64, jnp.float32):
        x0j = m.build_initial_value(jnp.asarray(x0, dtype), m.params).astype(dtype)
        params = {k: jnp.asarray(v, dtype) for k, v in m.params.items()}
        traj = solvers.solve(sol, m, t0, x0j, num_steps, save_every=save_every, params=params)
        out[dtype] = np.asarray(traj["x"], np.float64)
    num = np.linalg.norm(out[jnp.float32] - out[jnp.float64])
    den = np.linalg.norm(out[jnp.float64])
    rel = num / den
    assert rel < _TRAJ_TOL[name], f"f32 vs f64 rel error {rel:.2e} (tol {_TRAJ_TOL[name]:.0e})"


@pytest.mark.parametrize("family, tol", [("lotkavolterra2", 2e-4), ("hodgkinhuxley2_r4", 5e-3)])
def test_nll_f32_matches_f64(family, tol):
    vals = {}
    for dtype in (jnp.float64, jnp.float32):
        nll, p, q_sqrt, gamma_sqrt = generate.nll_rig(family, dtype=dtype)
        vals[dtype] = float(nll(p.astype(dtype), q_sqrt, gamma_sqrt))
    rel = abs(vals[jnp.float32] - vals[jnp.float64]) / abs(vals[jnp.float64])
    assert rel < tol, f"NLL f32={vals[jnp.float32]:.6f} f64={vals[jnp.float64]:.6f} rel={rel:.2e}"


@pytest.mark.slow
def test_lv_estimation_f32_equivalent_to_f64():
    """End-to-end gate: tempered estimation on LV2 must land on the same
    optimum in f32 as in f64, with equivalent tRMSE (VERDICT item 6)."""
    from ode_uncertainty_tpu import models, solvers
    from ode_uncertainty_tpu.inference import (
        make_nll,
        make_obs_model,
        make_param_spec,
        make_tempered_estimator,
        make_trmse_evaluator,
    )
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.ops import const_diag

    results = {}
    for dtype in (jnp.float64, jnp.float32):
        m = models.lotka_volterra()
        sol = solvers.rkf45(0.02)
        x0_raw = jnp.asarray([[1.0, 1.0]], dtype)
        num_steps = 400
        x0 = m.build_initial_value(x0_raw, m.params).astype(dtype)
        gt = solvers.solve(sol, m, 0.0, x0, num_steps)
        idx = np.arange(10, num_steps + 1, 10)
        noise = 0.1 * jax.random.normal(jax.random.key(3), (len(idx), 2), jnp.float64)
        ys_raw = np.asarray(gt["x"], np.float64)[idx].reshape(len(idx), -1) + np.asarray(noise)
        obs = make_obs_model(
            np.eye(2), np.asarray(gt["t"], np.float64)[idx], ys_raw, 0.1, 0.0, sol.h, num_steps, dtype=dtype
        )
        spec = make_param_spec(
            m.params,
            {k: (0.001, 5.0) for k in m.params},
            {"alpha": True, "beta": True, "gamma": False, "delta": False},
            dtype=dtype,
        )
        ekf = SqrtEKF(disable_cov_update=True)
        state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-10, dtype), 2)
        nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
        estimate = make_tempered_estimator(
            nll, spec, jnp.eye(2, dtype=dtype), max_iter=40, tol=1e-5
        )
        p0 = spec.sample_norm(jax.random.key(5), 8).astype(dtype)
        gammas = jnp.asarray([1e-2, 0.0], dtype)
        res = jax.block_until_ready(estimate(p0, gammas))
        best = int(np.argmin(np.asarray(res.nll_optims)[:, -1]))
        best_params = np.asarray(res.params_optims)[best, -1]
        best_nll = float(np.asarray(res.nll_optims)[best, -1])
        evaluate = make_trmse_evaluator(m, sol, spec, 0.0, x0_raw, num_steps)
        vals, mean, _ = evaluate(jnp.asarray(res.params_optims[:, -1, :], dtype))
        results[dtype] = (best_params, best_nll, float(np.asarray(vals)[best]))

    p32, f32_nll, t32 = results[jnp.float32]
    p64, f64_nll, t64 = results[jnp.float64]
    # Equivalent optimum quality: best-restart NLL within 1% relative. (The
    # parameter vectors themselves can differ by a few 1e-2 near the flat
    # optimum — f32 gradient noise legitimately stops the line search at a
    # slightly different point on the same basin floor.)
    assert abs(f32_nll - f64_nll) <= 0.01 * abs(f64_nll) + 0.05, (f32_nll, f64_nll)
    # tRMSE equivalence (the VERDICT gate): best-restart tRMSE within 10%.
    assert t32 <= max(1.1 * t64, t64 + 0.05), (t32, t64)
    # And both precisions recover the truth.
    np.testing.assert_allclose(p32, [1.5, 1.0], atol=0.1)
    np.testing.assert_allclose(p64, [1.5, 1.0], atol=0.1)
