"""Square-root kernel unit tests vs dense linear-algebra recomputation
(mirrors /root/reference/tests/test_utils.py and extends it: batched paths,
KL with unequal covariances, pushforward vs dense Jacobian)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ode_uncertainty_tpu import ops


def _rand_chol(key, n):
    a = random.normal(key, (n, n))
    return jnp.linalg.cholesky(a @ a.T + n * jnp.eye(n))


def test_sqrt_sum_two_factors():
    k1, k2 = random.split(random.key(7))
    a = random.normal(k1, (10, 10))
    b = _rand_chol(k2, 10)
    l = ops.sqrt_sum(a, b)
    np.testing.assert_allclose(
        np.asarray(l @ l.T), np.asarray(a @ a.T + b @ b.T), rtol=1e-10, atol=1e-10
    )
    # result is lower-triangular
    np.testing.assert_allclose(np.asarray(jnp.triu(l, 1)), 0.0, atol=1e-12)


def test_sqrt_sum_three_factors():
    keys = random.split(random.key(3), 3)
    fs = [random.normal(k, (6, 6)) for k in keys]
    l = ops.sqrt_sum(*fs)
    expected = sum(np.asarray(f @ f.T) for f in fs)
    np.testing.assert_allclose(np.asarray(l @ l.T), expected, rtol=1e-10, atol=1e-10)


def test_sqrt_sum_zero_factor():
    l0 = _rand_chol(random.key(0), 5)
    l = ops.sqrt_sum(l0, jnp.zeros((5, 5)))
    np.testing.assert_allclose(np.asarray(l @ l.T), np.asarray(l0 @ l0.T), rtol=1e-10)


def test_sqrt_sum_batched():
    keys = random.split(random.key(5), 8)
    a = jnp.stack([random.normal(k, (4, 4)) for k in keys])
    b = jnp.broadcast_to(jnp.eye(4) * 0.3, (8, 4, 4))
    l = ops.sqrt_sum(a, b)
    assert l.shape == (8, 4, 4)
    want = np.einsum("bij,bkj->bik", np.asarray(a), np.asarray(a)) + 0.09 * np.eye(4)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", np.asarray(l), np.asarray(l)), want, rtol=1e-9)


def test_nll_gaussian_sqrt_vs_scipy():
    from jax.scipy.stats import multivariate_normal

    key = random.key(11)
    x = random.normal(key, (10,))
    m = jnp.zeros(10)
    chol = _rand_chol(random.key(4), 10)
    got = ops.nll_gaussian_sqrt(x, m, chol)
    want = -multivariate_normal.logpdf(x, m, chol @ chol.T)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_nll_with_sign_indefinite_factor():
    """sqrt_sum factors may have negative diagonal entries; the NLL must be
    invariant to column signs."""
    chol = _rand_chol(random.key(4), 6)
    signs = jnp.diag(jnp.array([1.0, -1.0, 1.0, -1.0, -1.0, 1.0]))
    x = random.normal(random.key(2), (6,))
    a = ops.nll_gaussian_sqrt(x, jnp.zeros(6), chol)
    b = ops.nll_gaussian_sqrt(x, jnp.zeros(6), chol @ signs)
    # chol @ signs is no longer triangular-with-positive-diag but still
    # lower-triangular up to sign; same covariance.
    np.testing.assert_allclose(float(a), float(b), rtol=1e-10)


def test_pdf_gaussian_sqrt():
    from jax.scipy.stats import multivariate_normal

    x = random.normal(random.key(1), (7,))
    m = random.normal(random.key(2), (7,))
    chol = _rand_chol(random.key(3), 7)
    np.testing.assert_allclose(
        float(ops.pdf_gaussian_sqrt(x, m, chol)),
        float(multivariate_normal.pdf(x, m, chol @ chol.T)),
        rtol=1e-9,
    )


def test_kl_gaussian_sqrt_vs_dense():
    m1 = random.normal(random.key(1), (5,))
    m2 = random.normal(random.key(2), (5,))
    s1 = _rand_chol(random.key(3), 5)
    s2 = _rand_chol(random.key(4), 5)
    got = ops.kl_gaussian_sqrt(m1, m2, s1, s2)
    p1 = np.asarray(s1 @ s1.T)
    p2 = np.asarray(s2 @ s2.T)
    p2_inv = np.linalg.inv(p2)
    d = np.asarray(m2 - m1)
    want = 0.5 * (
        np.log(np.linalg.det(p2) / np.linalg.det(p1))
        - 5
        + d @ p2_inv @ d
        + np.trace(p2_inv @ p1)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-8)
    # Jeffrey divergence is symmetric
    j12 = ops.jeffrey_gaussian_sqrt(m1, m2, s1, s2)
    j21 = ops.jeffrey_gaussian_sqrt(m2, m1, s2, s1)
    np.testing.assert_allclose(float(j12), float(j21), rtol=1e-8)


def test_push_sqrt_matches_dense_jacobian():
    def f(x):
        return jnp.sin(x) * x[::-1] + 0.1 * x**2, jnp.abs(x)

    x = random.normal(random.key(9), (6,))
    p = _rand_chol(random.key(10), 6)
    (y, aux), jp = ops.push_sqrt(f, x, p)
    jac = jax.jacfwd(lambda z: f(z)[0])(x)
    np.testing.assert_allclose(np.asarray(jp), np.asarray(jac @ p), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(y), np.asarray(f(x)[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(aux), np.asarray(jnp.abs(x)), rtol=1e-12)


def test_sync_times():
    ts_x = np.arange(1, 11) * 0.01
    ts_y = np.array([0.05, 0.1, 0.2])  # 0.2 beyond grid
    x_idx, y_idx = ops.sync_times(ts_x, ts_y)
    np.testing.assert_array_equal(x_idx, [4, 9])
    np.testing.assert_array_equal(y_idx, [0, 1])


def test_build_observation_maps():
    ts_y = np.array([0.1, 0.2, 0.3])
    flags, index_map = ops.build_observation_maps(0.0, 0.05, 8, ts_y)
    # steps land at 0.05,0.10,...,0.40 -> obs at steps 1, 3, 5
    np.testing.assert_array_equal(np.nonzero(flags)[0], [1, 3, 5])
    np.testing.assert_array_equal(index_map[[1, 3, 5]], [0, 1, 2])


def test_obs_model_tolerance_with_finer_observation_grid():
    # Calibration configs pair an h=0.01 filter with dt=1e-3 gt observations
    # (reference configs/calibration_conrad_baseline/rkf45/vanderpol.yaml); a
    # step_size/4 tolerance matches several obs per step and used to raise.
    from ode_uncertainty_tpu.inference import make_obs_model

    h, dt, t0, tN = 0.01, 0.001, 10.0, 12.0
    num_steps = int(round((tN - t0) / h))
    # emulate an f32-accumulated stored time grid (small absolute error)
    ts_y = (t0 + dt * np.arange(int(round((tN - t0) / dt)) + 1)).astype(np.float32)
    ys = np.zeros((len(ts_y), 2, 1))
    obs = make_obs_model(np.eye(2), ts_y, ys, 0.1, t0, h, num_steps)
    flags = np.asarray(obs.flags)
    # every solver step has exactly one matching observation
    assert flags.sum() == num_steps
    idx = np.asarray(obs.index_map)
    # matched obs rows are the every-10th rows of the fine grid
    np.testing.assert_array_equal(idx[flags], np.arange(1, num_steps + 1) * 10)


def test_normalize_roundtrip():
    vals = {"a": jnp.array([1.0, 2.0]), "b": jnp.array(5.0)}
    mins = {"a": jnp.array([0.0, 0.0]), "b": jnp.array(0.0)}
    maxs = {"a": jnp.array([4.0, 4.0]), "b": jnp.array(10.0)}
    n = ops.normalize(vals, mins, maxs)
    np.testing.assert_allclose(np.asarray(n["a"]), [0.25, 0.5])
    np.testing.assert_allclose(float(n["b"]), 0.5)
    back = ops.inv_normalize(n, mins, maxs)
    np.testing.assert_allclose(np.asarray(back["a"]), [1.0, 2.0])


def test_qr_r_small_matches_lapack():
    from ode_uncertainty_tpu.ops.small_qr import qr_r_small

    for (m, n) in [(4, 2), (6, 3), (16, 8), (24, 8), (3, 3)]:
        a = random.normal(random.key(m * 100 + n), (5, m, n))
        r1 = qr_r_small(a)
        r2 = jnp.linalg.qr(a, mode="r")
        # upper-triangular
        np.testing.assert_allclose(np.asarray(jnp.tril(r1, -1)), 0.0, atol=1e-12)
        # same Gram matrix (R is unique up to row signs)
        g1 = np.einsum("bji,bjk->bik", np.asarray(r1), np.asarray(r1))
        g2 = np.einsum("bji,bjk->bik", np.asarray(r2), np.asarray(r2))
        np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-9)


def test_qr_r_small_zero_and_rank_deficient():
    from ode_uncertainty_tpu.ops.small_qr import qr_r_small

    z = jnp.zeros((4, 3))
    np.testing.assert_allclose(np.asarray(qr_r_small(z)), 0.0, atol=1e-12)
    # rank-1 matrix
    v = jnp.array([1.0, 2.0, 3.0, 4.0])[:, None]
    a = v @ jnp.array([[1.0, 2.0]])
    r = qr_r_small(a)
    g = np.asarray(r.T @ r)
    np.testing.assert_allclose(g, np.asarray(a.T @ a), rtol=1e-10, atol=1e-10)


def test_qr_r_small_differentiable():
    from ode_uncertainty_tpu.ops.small_qr import qr_r_small

    a = random.normal(random.key(0), (6, 3))

    def f(x):
        r = qr_r_small(x)
        return jnp.sum(r**2)

    g = jax.grad(f)(a)
    assert bool(jnp.all(jnp.isfinite(g)))
    # grad of sum(R^2) = grad of sum of squared entries = grad tr(A^T A) = 2A
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * a), rtol=1e-8)


def test_pull_sqrt_matches_dense_jacobian():
    from ode_uncertainty_tpu.ops.linearize import pull_sqrt

    def f(x):
        return jnp.cos(x) * x[::-1], jnp.abs(x)

    x = random.normal(random.key(3), (5,))
    m = random.normal(random.key(4), (3, 5))
    (y, aux), mj = pull_sqrt(f, x, m)
    jac = jax.jacfwd(lambda z: f(z)[0])(x)
    np.testing.assert_allclose(np.asarray(mj), np.asarray(m @ jac), rtol=1e-10)


def test_exponential_analytic_solution():
    from ode_uncertainty_tpu import models

    m = models.exponential(growth_factor=0.7)
    ts = jnp.linspace(0.0, 2.0, 5)
    xs = m.solution(ts, jnp.array([[2.0]]), m.params)
    np.testing.assert_allclose(np.asarray(xs[:, 0]), 2.0 * np.exp(0.7 * np.asarray(ts)), rtol=1e-12)


def test_scalar_observation_paths():
    """L=1 special cases (division instead of 1x1 LAPACK solves) agree with
    the general path."""
    chol = jnp.array([[0.7]])
    x = jnp.array([1.3])
    m = jnp.array([0.9])
    want = 0.5 * ((1.3 - 0.9) / 0.7) ** 2 + 0.5 * np.log(2 * np.pi) + np.log(0.7)
    np.testing.assert_allclose(float(ops.nll_gaussian_sqrt(x, m, chol)), want, rtol=1e-12)
    b = jnp.array([[2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(ops.cho_solve_sqrt(chol, b)), np.asarray(b) / 0.49, rtol=1e-12)
    # batched
    chols = jnp.array([[[0.5]], [[2.0]]])
    xs = jnp.array([[1.0], [3.0]])
    got = ops.nll_gaussian_sqrt(xs, jnp.zeros((2, 1)), chols)
    for i, (c, v) in enumerate([(0.5, 1.0), (2.0, 3.0)]):
        want = 0.5 * (v / c) ** 2 + 0.5 * np.log(2 * np.pi) + np.log(c)
        np.testing.assert_allclose(float(got[i]), want, rtol=1e-12)


class TestInvSmall:
    def test_matches_linalg_inv_batched(self):
        import numpy as np
        import jax.numpy as jnp
        from ode_uncertainty_tpu.ops.small_inv import inv_small

        rng = np.random.default_rng(0)
        for n in (1, 2, 4, 8):
            # diagonally dominant (the simplified-Newton regime)
            a = np.eye(n) + 0.2 * rng.standard_normal((64, n, n))
            got = np.asarray(inv_small(jnp.asarray(a)))
            want = np.linalg.inv(a)
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_gradients_flow(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from ode_uncertainty_tpu.ops.small_inv import inv_small

        a = jnp.eye(3) * 2.0 + 0.1
        g = jax.grad(lambda m: jnp.sum(inv_small(m) ** 2))(a)
        # d/dA sum(inv(A)^2): check against finite differences
        eps = 1e-6
        fd = np.zeros((3, 3))
        base = float(jnp.sum(inv_small(a) ** 2))
        for i in range(3):
            for j in range(3):
                ap = a.at[i, j].add(eps)
                fd[i, j] = (float(jnp.sum(inv_small(ap) ** 2)) - base) / eps
        np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-4, atol=1e-6)
