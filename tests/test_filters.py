"""Filter-level oracles the reference lacks (SURVEY.md §4): sqrt-EKF vs a
dense Kalman filter on a linear ODE (exact agreement), covariance-update
algebra, particle-filter semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ode_uncertainty_tpu import models, solvers
from ode_uncertainty_tpu.filters import (
    DiagonalUpdate,
    OuterUpdate,
    ParticleFilter,
    SqrtEKF,
    StaticDiagonalUpdate,
)
from ode_uncertainty_tpu.inference import empty_obs_model, make_ekf_run, make_obs_model, make_pf_run
from ode_uncertainty_tpu.ops import const_diag


# ---------------------------------------------------------------- cov updates
def test_diagonal_update_sqrt_matches_full():
    u = DiagonalUpdate(scale=1.7)
    chol = jnp.linalg.cholesky(jnp.eye(4) * 2.0 + 0.5)
    eps = jnp.array([0.1, 0.2, 0.0, 0.4])
    full = u.apply(chol @ chol.T, eps)
    srt = u.apply_sqrt(chol, eps)
    np.testing.assert_allclose(np.asarray(srt @ srt.T), np.asarray(full), rtol=1e-10)


def test_outer_update_sqrt_matches_full():
    u = OuterUpdate(scale=0.9)
    chol = jnp.linalg.cholesky(jnp.eye(3) * 1.5 + 0.2)
    eps = jnp.array([0.3, 0.1, 0.2])
    full = u.apply(chol @ chol.T, eps)
    srt = u.apply_sqrt(chol, eps)
    np.testing.assert_allclose(np.asarray(srt @ srt.T), np.asarray(full), rtol=1e-10)


def test_static_update_sqrt_matches_full():
    u = StaticDiagonalUpdate()
    chol = jnp.linalg.cholesky(jnp.eye(3) + 0.3)
    sigma = jnp.asarray(0.7)
    full = u.apply(sigma, chol @ chol.T, jnp.zeros(3))
    srt = u.apply_sqrt(sigma, chol, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(srt @ srt.T), np.asarray(full), rtol=1e-10)


def test_update_samplers_match_covariance():
    for u, eps in [
        (DiagonalUpdate(scale=1.3), jnp.array([0.5, 1.0, 0.25])),
        (OuterUpdate(scale=0.8), jnp.array([0.4, 0.2, 0.6])),
    ]:
        keys = random.split(random.key(0), 40000)
        draws = jax.vmap(lambda k: u.sample(k, eps))(keys)
        emp_cov = np.cov(np.asarray(draws).T)
        want = np.asarray(u.apply(jnp.zeros((3, 3)), eps))
        np.testing.assert_allclose(emp_cov, want, atol=0.02 * np.max(want) + 1e-3)
        np.testing.assert_allclose(np.asarray(draws.mean(0)), 0.0, atol=0.02)


# ---------------------------------------------------------------- sqrt EKF
def _dense_kf_reference(a_mat, q, h, p0, x0, steps, obs=None):
    """Textbook dense KF on the exact linear discrete system x' = F x."""
    import scipy.linalg as sla

    f = sla.expm(np.asarray(a_mat) * h)
    x = np.asarray(x0)
    p = np.asarray(p0)
    traj = []
    for k in range(steps):
        x = f @ x
        p = f @ p @ f.T + q
        if obs is not None and k in obs:
            y, hm, r = obs[k]
            s = hm @ p @ hm.T + r
            kk = p @ hm.T @ np.linalg.inv(s)
            x = x + kk @ (y - hm @ x)
            ikh = np.eye(len(x)) - kk @ hm
            p = ikh @ p @ ikh.T + kk @ r @ kk.T
        traj.append((x.copy(), p.copy()))
    return traj


def test_sqrt_ekf_matches_dense_kf_linear_ode():
    """On a linear ODE with an (essentially exact) high-order solver and
    static process noise, the sqrt-EKF must reproduce the textbook dense
    Kalman filter to floating-point accuracy."""
    # 2D linear system as "exponential growth" of a rotated state:
    # use RLC circuit (linear second-order) -> companion matrix.
    r_, l_, c_ = 1.0, 1.0, 1.0
    m = models.rlc_circuit(resistance=r_, inductance=l_, capacitance=c_)
    a_mat = np.array([[0.0, 1.0], [-1.0 / (l_ * c_), -r_ / l_]])
    h = 0.05
    sol = solvers.dopri65(step_size=h)
    ekf = SqrtEKF(disable_cov_update=True)

    x0 = jnp.array([[1.0], [0.5]])
    p0_sqrt = const_diag(2, 0.1)
    q_w = jnp.array([0.02, 0.03])
    q_sqrt = jnp.diag(q_w)
    gamma_sqrt = jnp.asarray(1.0)

    num_steps = 40
    obs_steps = {9: None, 24: None}
    hm = np.array([[1.0, 0.0]])
    r_var = 0.04
    rng = np.random.default_rng(0)
    ys = {k: np.array([1.0 + 0.1 * rng.standard_normal()]) for k in obs_steps}

    # --- our filter, via the run driver
    ts_y = 0.0 + h * (np.array([9, 24]) + 1)
    ys_arr = np.stack([np.concatenate([ys[9], [0.0]]), np.concatenate([ys[24], [0.0]])])
    obs = make_obs_model(hm, ts_y, ys_arr, r_var, 0.0, h, num_steps, dtype=jnp.float64)
    run = make_ekf_run(ekf, sol, m, num_steps)
    state0 = ekf.init_state(0.0, x0, p0_sqrt, 1)
    _, traj = run(state0, m.params, q_sqrt, gamma_sqrt, obs)

    # --- dense reference
    dense_obs = {k: (ys[k], hm, np.array([[r_var]])) for k in obs_steps}
    dense = _dense_kf_reference(
        a_mat, np.diag(np.asarray(q_w) ** 2), h, np.asarray(p0_sqrt) @ np.asarray(p0_sqrt).T,
        np.asarray(x0).ravel(), num_steps, dense_obs
    )

    for k in [5, 9, 20, 24, 39]:
        x_ours = np.asarray(traj.x[k + 1]).ravel()
        p_ours_sqrt = np.asarray(traj.P_sqrt[k + 1])
        p_ours = p_ours_sqrt @ p_ours_sqrt.T
        x_ref, p_ref = dense[k]
        np.testing.assert_allclose(x_ours, x_ref, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(p_ours, p_ref, rtol=1e-6, atol=1e-10)


def test_sqrt_ekf_local_error_update_grows_covariance():
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.01)
    ekf = SqrtEKF(cov_update=DiagonalUpdate(), disable_cov_update=False)
    num_steps = 100
    obs = empty_obs_model(2, num_steps, dtype=jnp.float64)
    state0 = ekf.init_state(0.0, jnp.array([[1.0, 1.0]]), const_diag(2, 1e-12), 2)
    run = make_ekf_run(ekf, sol, m, num_steps)
    zero_q = jnp.zeros((2, 2))
    _, traj = run(state0, m.params, zero_q, jnp.asarray(0.0), obs)
    var0 = float(jnp.sum(traj.P_sqrt[1] ** 2))
    var_end = float(jnp.sum(traj.P_sqrt[-1] ** 2))
    assert var_end > var0 > 0
    assert np.isfinite(var_end)


def test_sqrt_ekf_disable_cov_update_keeps_covariance_deterministic():
    """With local-error update disabled and Q=0, covariance follows the pure
    linearized propagation (reference semantics of disable_cov_update)."""
    m = models.exponential(growth_factor=0.5)
    sol = solvers.rkf45(step_size=0.1)
    ekf = SqrtEKF(disable_cov_update=True)
    num_steps = 10
    obs = empty_obs_model(1, num_steps, dtype=jnp.float64)
    p0 = const_diag(1, 0.1)
    state0 = ekf.init_state(0.0, jnp.array([[1.0]]), p0, 1)
    run = make_ekf_run(ekf, sol, m, num_steps)
    _, traj = run(state0, m.params, jnp.zeros((1, 1)), jnp.asarray(0.0), obs)
    # linear ODE: P(t) = exp(2 a t) P0
    p_end = float(traj.P_sqrt[-1, 0, 0] ** 2)
    np.testing.assert_allclose(p_end, 0.01 * np.exp(2 * 0.5 * 1.0), rtol=1e-6)


# ---------------------------------------------------------------- particle
def test_particle_filter_particle0_is_deterministic():
    m = models.lorenz()
    sol = solvers.rkf45(step_size=0.01)
    pf = ParticleFilter(cov_update=DiagonalUpdate(), num_particles=16)
    state0 = pf.init_state(0.0, jnp.array([[1.0, 1.0, 1.0]]), random.key(3))
    run = make_pf_run(pf, sol, m, 50)
    _, traj = run(state0, m.params)
    det = solvers.solve(sol, m, 0.0, jnp.array([[1.0, 1.0, 1.0]]), 50)
    np.testing.assert_allclose(
        np.asarray(traj.x[:, 0]), np.asarray(det["x"]), rtol=1e-10, atol=1e-12
    )
    # other particles spread out
    spread = float(jnp.std(traj.x[-1], axis=0).max())
    assert spread > 0


def test_particle_filter_reproducible_and_key_advances():
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.01)
    pf = ParticleFilter(num_particles=8)
    s0 = pf.init_state(0.0, jnp.array([[1.0, 1.0]]), random.key(0))
    run = make_pf_run(pf, sol, m, 20)
    _, t1 = run(s0, m.params)
    _, t2 = run(s0, m.params)
    np.testing.assert_array_equal(np.asarray(t1.x), np.asarray(t2.x))
    kd = jax.random.key_data(t1.key)
    assert not np.array_equal(np.asarray(kd[0]), np.asarray(kd[-1]))


def test_ekf_run_vmaps_over_batch():
    """The whole EKF run lifts over a restart batch axis with vmap."""
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.02)
    ekf = SqrtEKF(disable_cov_update=True)
    num_steps = 25
    obs = empty_obs_model(2, num_steps, dtype=jnp.float64)
    run = make_ekf_run(ekf, sol, m, num_steps)

    x0s = jnp.stack([jnp.array([[1.0, 1.0]]), jnp.array([[1.2, 0.8]]), jnp.array([[0.9, 1.4]])])
    states = jax.vmap(lambda x: ekf.init_state(0.0, x, const_diag(2, 1e-6), 2))(x0s)
    zero_q = jnp.zeros((2, 2))
    _, trajs = jax.vmap(lambda s: run(s, m.params, zero_q, jnp.asarray(0.0), obs))(states)
    assert trajs.x.shape == (3, num_steps + 1, 1, 2)
    singles = [run(ekf.init_state(0.0, x, const_diag(2, 1e-6), 2), m.params, zero_q, jnp.asarray(0.0), obs)[1] for x in x0s]
    np.testing.assert_allclose(np.asarray(trajs.x[1]), np.asarray(singles[1].x), rtol=1e-12)
