"""Extension-filter oracles: dense EKF vs sqrt EKF, UKF exactness on linear
systems, sqrt-UKF vs dense UKF, rank-1 Cholesky update, GMM split/merge
algebra and mixture consistency."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ode_uncertainty_tpu import models, solvers
from ode_uncertainty_tpu.filters import (
    DenseEKF,
    DiagonalUpdate,
    GMMSqrtEKF,
    SqrtEKF,
    SqrtUKF,
    UKF,
)
from ode_uncertainty_tpu.ops import const_diag
from ode_uncertainty_tpu.ops.chol_update import chol_update


def _run_filter(flt, predict, correct, state, params, q, gamma, steps, obs_at=None):
    for k in range(steps):
        state = predict(state, params, q, gamma)
        if obs_at and k in obs_at:
            y, H, r = obs_at[k]
            state = correct(state, H, y, r)
    return state


def test_chol_update_vs_dense():
    for seed in range(3):
        k1, k2 = random.split(random.key(seed))
        a = random.normal(k1, (5, 5))
        chol = jnp.linalg.cholesky(a @ a.T + 5 * jnp.eye(5))
        v = random.normal(k2, (5,))
        up = chol_update(chol, v, 0.7)
        np.testing.assert_allclose(
            np.asarray(up @ up.T), np.asarray(chol @ chol.T + 0.7 * jnp.outer(v, v)), rtol=1e-9
        )
        dn = chol_update(chol, 0.2 * v, -1.0)
        np.testing.assert_allclose(
            np.asarray(dn @ dn.T),
            np.asarray(chol @ chol.T - 0.04 * jnp.outer(v, v)),
            rtol=1e-8,
            atol=1e-10,
        )


def _lv_setup(dtype=jnp.float64):
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.02)
    x0 = jnp.array([[1.0, 2.0]], dtype)
    p0_sqrt = const_diag(2, 0.05, dtype)
    q = jnp.diag(jnp.array([0.01, 0.02], dtype))
    y = jnp.array([1.1], dtype)
    H = jnp.array([[1.0, 0.0]], dtype)
    r_var = 0.04
    return m, sol, x0, p0_sqrt, q, y, H, r_var


def test_dense_ekf_matches_sqrt_ekf():
    m, sol, x0, p0_sqrt, q_sqrt, y, H, r_var = _lv_setup()
    r_sqrt = const_diag(1, r_var**0.5)
    gamma_sqrt = jnp.asarray(1.0)

    sq = SqrtEKF(disable_cov_update=True)
    s1 = sq.init_state(0.0, x0, p0_sqrt, 1)
    pred1, corr1 = sq.make_predict(sol, m.rhs), sq.make_correct()
    s1 = _run_filter(
        sq, pred1, corr1, s1, m.params, q_sqrt, gamma_sqrt, 20,
        obs_at={9: (y, H, r_sqrt), 15: (y, H, r_sqrt)},
    )

    de = DenseEKF(cov_update=DiagonalUpdate(scale=0.0))  # zero local-error term
    s2 = de.init_state(0.0, x0, p0_sqrt @ p0_sqrt.T, 1)
    pred2, corr2 = de.make_predict(sol, m.rhs), de.make_correct()
    # dense variant takes full Q and gamma
    s2 = _run_filter(
        de, pred2, corr2, s2, m.params, q_sqrt @ q_sqrt.T, jnp.asarray(1.0), 20,
        obs_at={9: (y, H, const_diag(1, r_var)), 15: (y, H, const_diag(1, r_var))},
    )

    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s1.P_sqrt @ s1.P_sqrt.T), np.asarray(s2.P), rtol=1e-7, atol=1e-12
    )


def test_ukf_matches_kf_on_linear_system():
    """On a linear ODE the unscented transform is exact: UKF == EKF."""
    m = models.rlc_circuit()
    sol = solvers.dopri65(step_size=0.05)
    x0 = jnp.array([[1.0], [0.5]])
    p0 = const_diag(2, 0.1)
    q = jnp.diag(jnp.array([0.0004, 0.0009]))
    gamma = jnp.asarray(1.0)

    de = DenseEKF(cov_update=DiagonalUpdate(scale=0.0))
    se = de.init_state(0.0, x0, p0 @ p0.T, 1)
    predd = de.make_predict(sol, m.rhs)
    uk = UKF(cov_update=DiagonalUpdate(scale=0.0))
    su = uk.init_state(0.0, x0, p0 @ p0.T, 1)
    predu = uk.make_predict(sol, m.rhs)
    for _ in range(15):
        se = predd(se, m.params, q, gamma)
        su = predu(su, m.params, q, gamma)
    np.testing.assert_allclose(np.asarray(su.x), np.asarray(se.x), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(su.P), np.asarray(se.P), rtol=1e-5, atol=1e-12)


def test_sqrt_ukf_matches_dense_ukf():
    m, sol, x0, p0_sqrt, q_sqrt, y, H, r_var = _lv_setup()
    gamma_sqrt = jnp.asarray(1.0)
    r_sqrt = const_diag(1, r_var**0.5)

    uk = UKF()
    su = uk.init_state(0.0, x0, p0_sqrt @ p0_sqrt.T, 1)
    predu, corru = uk.make_predict(sol, m.rhs), uk.make_correct()
    sq = SqrtUKF()
    ss = sq.init_state(0.0, x0, p0_sqrt, 1)
    preds, corrs = sq.make_predict(sol, m.rhs), sq.make_correct()

    for k in range(12):
        su = predu(su, m.params, q_sqrt @ q_sqrt.T, jnp.asarray(1.0))
        ss = preds(ss, m.params, q_sqrt, gamma_sqrt)
        if k == 7:
            su = corru(su, H, y, const_diag(1, r_var))
            ss = corrs(ss, H, y, r_sqrt)

    np.testing.assert_allclose(np.asarray(ss.x), np.asarray(su.x), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ss.P_sqrt @ ss.P_sqrt.T), np.asarray(su.P), rtol=1e-5, atol=1e-12
    )


def test_gmm_split_preserves_moments():
    """A split halves weights and preserves the component's mean/covariance
    moment (mean average, covariance via downdate + displacement)."""
    gmm = GMMSqrtEKF(max_components=4, nl_threshold=-1.0, merge_threshold=-1.0)
    m = models.lorenz()
    sol = solvers.rkf45(step_size=0.01)
    x0 = jnp.array([[1.0, 1.0, 1.0]])
    state = gmm.init_state(0.0, x0, const_diag(3, 0.3))
    nl = jnp.array([1.0, -jnp.inf, -jnp.inf, -jnp.inf])
    split = gmm._split_many(state, nl)
    assert int(split.active.sum()) == 2
    np.testing.assert_allclose(float(split.weights.sum()), 1.0, rtol=1e-12)
    # mixture moments of the split equal the original component's moments
    mean, cov = GMMSqrtEKF.mixture_moments(split)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(cov), 0.09 * np.eye(3), rtol=1e-8, atol=1e-10)


def test_gmm_merge_moment_matching():
    gmm = GMMSqrtEKF(max_components=4, merge_threshold=1e9)
    x0 = jnp.array([[0.0, 0.0]])
    state = gmm.init_state(0.0, x0, const_diag(2, 0.5))
    # add a second active component manually
    m2 = jnp.array([[1.0, 0.5]])
    state = state.replace(
        means=state.means.at[1].set(m2),
        P_sqrt=state.P_sqrt.at[1].set(const_diag(2, 0.2)),
        weights=jnp.array([0.6, 0.4, 0.0, 0.0]),
        active=state.active.at[1].set(True),
    )
    before_mean, before_cov = GMMSqrtEKF.mixture_moments(state)
    merged = gmm._merge_pairs(state, exclude=jnp.zeros(4, bool))
    assert int(merged.active.sum()) == 1
    after_mean, after_cov = GMMSqrtEKF.mixture_moments(merged)
    np.testing.assert_allclose(np.asarray(after_mean), np.asarray(before_mean), atol=1e-10)
    np.testing.assert_allclose(np.asarray(after_cov), np.asarray(before_cov), rtol=1e-8)


def test_gmm_filter_runs_and_adapts():
    """End-to-end GMM run on chaotic Lorenz: stays finite, splits activate
    extra components, correction reweights toward the data."""
    gmm = GMMSqrtEKF(
        max_components=4, nl_threshold=0.5, merge_threshold=0.05, split_displacement=0.5
    )
    m = models.lorenz()
    sol = solvers.rkf45(step_size=0.01)
    x0 = jnp.array([[1.0, 1.0, 1.0]])
    state = gmm.init_state(0.0, x0, const_diag(3, 0.1))
    predict = gmm.make_predict(sol, m.rhs)
    correct = gmm.make_correct()
    q = jnp.zeros((3, 3))
    gs = jnp.asarray(0.0)
    H = jnp.eye(3)
    r_sqrt = const_diag(3, 0.1)

    @jax.jit
    def run(state):
        def step(s, k):
            s = predict(s, m.params, q, gs)
            s = jax.lax.cond(
                k % 10 == 9, lambda z: correct(z, H, jnp.array([1.5, 1.5, 10.0]), r_sqrt), lambda z: z, s
            )
            return s, s.active.sum()

        return jax.lax.scan(step, state, jnp.arange(60))

    final, n_active = run(state)
    assert bool(jnp.all(jnp.isfinite(final.means[final.active])))
    assert int(n_active.max()) >= 2  # splitting occurred
    np.testing.assert_allclose(float(final.weights.sum()), 1.0, rtol=1e-5)


def test_gmm_multi_split_capacity_bounded():
    """All above-threshold components split, most nonlinear first, bounded
    by free capacity (reference gmm_ekf.py:543-556)."""
    gmm = GMMSqrtEKF(max_components=4, nl_threshold=0.0)
    x0 = jnp.array([[0.0, 0.0]])
    state = gmm.init_state(0.0, x0, const_diag(2, 0.5))
    state = state.replace(
        means=state.means.at[1].set(jnp.array([[3.0, 3.0]])),
        P_sqrt=state.P_sqrt.at[1].set(const_diag(2, 0.5)),
        weights=jnp.array([0.5, 0.5, 0.0, 0.0]),
        active=state.active.at[1].set(True),
    )
    # three candidates above threshold but only two free slots
    nl = jnp.array([3.0, 2.0, 1.0, -jnp.inf])
    split = gmm._split_many(state, nl)
    assert int(split.active.sum()) == 4  # both active components split
    np.testing.assert_allclose(float(split.weights.sum()), 1.0, rtol=1e-12)
    mean0, _ = GMMSqrtEKF.mixture_moments(state)
    mean1, _ = GMMSqrtEKF.mixture_moments(split)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0), atol=1e-10)


def test_gmm_greedy_pairwise_merge():
    """Two well-separated close pairs merge in ONE predict-adaptation pass
    (reference merge_2 merges all below-threshold pairs, :285-323)."""
    gmm = GMMSqrtEKF(max_components=4, merge_threshold=10.0)
    x0 = jnp.array([[0.0, 0.0]])
    state = gmm.init_state(0.0, x0, const_diag(2, 0.3))
    ms = [jnp.array([[0.1, 0.0]]), jnp.array([[50.0, 50.0]]), jnp.array([[50.1, 50.0]])]
    for slot, mval in zip((1, 2, 3), ms):
        state = state.replace(
            means=state.means.at[slot].set(mval),
            P_sqrt=state.P_sqrt.at[slot].set(const_diag(2, 0.3)),
            active=state.active.at[slot].set(True),
        )
    state = state.replace(weights=jnp.full((4,), 0.25))
    merged = gmm._merge_pairs(state, exclude=jnp.zeros(4, bool))
    # (0,1) merge and (2,3) merge -> 2 components
    assert int(merged.active.sum()) == 2
    np.testing.assert_allclose(float(merged.weights.sum()), 1.0, rtol=1e-12)


def test_gmm_invalidate_distance_rule():
    """A component farther than the threshold from EVERY other component in
    some dimension is dropped (reference invalidate_by_distance)."""
    gmm = GMMSqrtEKF(max_components=4, distance_threshold=10.0)
    x0 = jnp.array([[0.0, 0.0]])
    state = gmm.init_state(0.0, x0, const_diag(2, 0.3))
    state = state.replace(
        means=state.means.at[1].set(jnp.array([[1.0, 0.0]])).at[2].set(jnp.array([[100.0, 0.0]])),
        P_sqrt=state.P_sqrt.at[1].set(const_diag(2, 0.3)).at[2].set(const_diag(2, 0.3)),
        weights=jnp.array([0.4, 0.4, 0.2, 0.0]),
        active=jnp.array([True, True, True, False]),
    )
    out = gmm._invalidate(state)
    np.testing.assert_array_equal(np.asarray(out.active), [True, True, False, False])
    np.testing.assert_allclose(float(out.weights.sum()), 1.0, rtol=1e-12)


def test_gmm_invalidate_min_weight():
    """Below-minimum-weight components are pruned (reference min_w validity
    gate, gmm_ekf.py:384/:501), and surviving weights renormalize."""
    gmm = GMMSqrtEKF(max_components=4, distance_threshold=1e9, min_weight=0.01)
    x0 = jnp.array([[0.0, 0.0]])
    state = gmm.init_state(0.0, x0, const_diag(2, 0.3))
    state = state.replace(
        means=state.means.at[1].set(jnp.array([[1.0, 0.0]])).at[2].set(jnp.array([[2.0, 0.0]])),
        P_sqrt=state.P_sqrt.at[1].set(const_diag(2, 0.3)).at[2].set(const_diag(2, 0.3)),
        weights=jnp.array([0.6, 0.395, 0.005, 0.0]),
        active=jnp.array([True, True, True, False]),
    )
    out = gmm._invalidate(state)
    np.testing.assert_array_equal(np.asarray(out.active), [True, True, False, False])
    np.testing.assert_allclose(
        np.asarray(out.weights), [0.6 / 0.995, 0.395 / 0.995, 0.0, 0.0], rtol=1e-6
    )
