"""Solver correctness vs analytic solutions + order-of-convergence checks.

Mirrors the reference's (stale) test strategy — RKF45 on Logistic and on RLC
in all three damping regimes vs closed forms (/root/reference/tests/
test_solvers.py) — and extends it with convergence-order measurements and
implicit-solver coverage the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_uncertainty_tpu import models, solvers


def _unroll(solver, model, t0, x0, num_steps):
    traj = solvers.solve(solver, model, t0, x0, num_steps)
    return traj["t"], traj["x"]


def test_rkf45_logistic_vs_analytic():
    m = models.logistic()
    sol = solvers.rkf45(step_size=0.1)
    x0 = jnp.array([[0.01]])
    ts, xs = _unroll(sol, m, 0.0, x0, 100)
    xs_true = m.solution(ts, x0, m.params)
    np.testing.assert_allclose(np.asarray(xs[:, 0, :]), np.asarray(xs_true), rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize(
    "r,l,c",
    [
        (2500.0, 400.0, 2.5e-5),  # underdamped
        (4000.0, 160.0, 4e-5),  # near-critical
        (5000.0, 160.0, 4e-5),  # overdamped
    ],
)
def test_rkf45_rlc_vs_analytic(r, l, c):
    m = models.rlc_circuit(resistance=r, inductance=l, capacitance=c)
    sol = solvers.rkf45(step_size=0.01)
    x0 = jnp.array([[10.0], [0.0]])
    ts, xs = _unroll(sol, m, 0.0, x0, 100)
    xs_true = m.solution(ts, x0, m.params)
    np.testing.assert_allclose(
        np.asarray(xs[:, 0, :]), np.asarray(xs_true), rtol=1e-4, atol=1e-7
    )


@pytest.mark.parametrize(
    "factory,order_min",
    [
        (solvers.heun_euler, 1.8),  # propagated solution is order >=2 here
        (solvers.bs32, 2.8),
        (solvers.rkf45, 3.8),
        (solvers.dopri65, 5.5),
    ],
)
def test_erk_convergence_order(factory, order_min):
    """Halving h must reduce global error by ~2^order."""
    m = models.logistic(growth_rate=1.3, carrying_capacity=2.0)
    x0 = jnp.array([[0.05]])
    t_end = 2.0
    errs = []
    for h in (0.1, 0.05):
        n = int(round(t_end / h))
        ts, xs = _unroll(factory(step_size=h), m, 0.0, x0, n)
        xs_true = m.solution(ts, x0, m.params)
        errs.append(float(jnp.max(jnp.abs(xs[:, 0, :] - xs_true))))
    order = np.log2(errs[0] / errs[1])
    assert order > order_min, f"measured order {order:.2f}, errors {errs}"


def test_eps_tracks_true_local_error():
    """The embedded estimate must scale like the true local error."""
    m = models.lotka_volterra()
    h = 0.05
    sol = solvers.rkf45(step_size=h)
    fine = solvers.rkf45(step_size=h / 20)
    x = jnp.array([[1.0, 2.0]])
    _, eps = sol.step(m.rhs, m.params, jnp.asarray(0.0), x)
    # true local error: one coarse step vs 20 fine steps
    x_coarse, _ = sol.step(m.rhs, m.params, jnp.asarray(0.0), x)
    x_ref = x
    for i in range(20):
        x_ref, _ = fine.step(m.rhs, m.params, jnp.asarray(i * h / 20), x_ref)
    true_err = jnp.abs(x_coarse - x_ref)
    # estimate within 100x of the truth and nonzero
    assert float(jnp.max(eps)) > 0
    ratio = float(jnp.max(true_err) / jnp.max(eps))
    assert 1e-2 < ratio < 1e2


def test_save_every_matches_dense_save():
    m = models.lorenz()
    sol = solvers.dopri65(step_size=0.01)
    x0 = jnp.array([[1.0, 1.0, 1.0]])
    dense = solvers.solve(sol, m, 0.0, x0, 40, save_every=1)
    sparse = solvers.solve(sol, m, 0.0, x0, 40, save_every=10)
    np.testing.assert_allclose(
        np.asarray(sparse["x"]), np.asarray(dense["x"][::10]), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sparse["eps"]), np.asarray(dense["eps"][::10]), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(sparse["t"]), np.asarray(dense["t"][::10]), atol=1e-12)


def test_kvaerno3_logistic_vs_analytic():
    m = models.logistic()
    sol = solvers.kvaerno3(step_size=0.1)
    x0 = jnp.array([[0.01]])
    ts, xs = _unroll(sol, m, 0.0, x0, 100)
    xs_true = m.solution(ts, x0, m.params)
    np.testing.assert_allclose(np.asarray(xs[:, 0, :]), np.asarray(xs_true), rtol=1e-4, atol=1e-7)


def test_kvaerno3_stiff_van_der_pol():
    """Implicit solver stays stable on stiff VdP where an explicit solver at
    the same step size blows up."""
    m = models.van_der_pol(damping=50.0)
    x0 = jnp.array([[2.0], [0.0]])
    n = 200
    h = 0.05
    _, xs_imp = _unroll(solvers.kvaerno3(step_size=h), m, 0.0, x0, n)
    assert bool(jnp.all(jnp.isfinite(xs_imp)))
    assert float(jnp.max(jnp.abs(xs_imp[:, 0, 0]))) < 3.0  # bounded oscillation
    _, xs_exp = _unroll(solvers.rkf45(step_size=h), m, 0.0, x0, n)
    assert not bool(jnp.all(jnp.isfinite(xs_exp)))  # explicit diverges


def test_kvaerno3_eps_nonzero():
    """Unlike the reference's diffrax wrapper (eps hard-zeroed,
    src/solvers/diffrax_solver.py:130), the native ESDIRK reports a real
    embedded error estimate."""
    m = models.lotka_volterra()
    sol = solvers.kvaerno3(step_size=0.05)
    _, eps = sol.step(m.rhs, m.params, jnp.asarray(0.0), jnp.array([[1.0, 2.0]]))
    assert float(jnp.max(eps)) > 0


def test_erk_step_is_differentiable():
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=0.01)

    def loss(x):
        xn, _ = sol.step(m.rhs, m.params, jnp.asarray(0.0), x)
        return jnp.sum(xn**2)

    g = jax.grad(loss)(jnp.array([[1.0, 2.0]]))
    assert g.shape == (1, 2)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_kvaerno3_step_is_differentiable():
    m = models.van_der_pol(damping=5.0)
    sol = solvers.kvaerno3(step_size=0.05)

    def loss(x):
        xn, _ = sol.step(m.rhs, m.params, jnp.asarray(0.0), x)
        return jnp.sum(xn**2)

    g = jax.grad(loss)(jnp.array([[1.0], [0.5]]))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_kvaerno3_remat_stage_inverse_parity():
    """remat_stage_inverse=True must be bit-identical in the primal and
    match gradients exactly: it only changes WHERE the backward pass gets
    the stage-point inverse (recompute vs stored residual), not the math."""
    m = models.van_der_pol(damping=5.0)
    x0 = jnp.array([[1.0], [0.5]])

    def loss(sol, x):
        def body(x, _):
            xn, _err = sol.step(m.rhs, m.params, jnp.asarray(0.0), x)
            return xn, None
        xN, _ = jax.lax.scan(body, x, None, length=10)
        return jnp.sum(xN**2)

    base = solvers.kvaerno3(step_size=0.05)
    remat = solvers.kvaerno3(step_size=0.05, remat_stage_inverse=True)
    v0, g0 = jax.value_and_grad(lambda x: loss(base, x))(x0)
    v1, g1 = jax.value_and_grad(lambda x: loss(remat, x))(x0)
    assert float(jnp.abs(v0 - v1)) == 0.0
    assert float(jnp.max(jnp.abs(g0 - g1))) < 1e-12


@pytest.mark.parametrize("factory", [solvers.heun_euler, solvers.bs32, solvers.rkf45, solvers.dopri65])
def test_unrolled_step_matches_scan_formulation(factory):
    """An independent lax.scan-over-stages RK evaluation (the reference's
    formulation, src/solvers/rksolver.py:138-151) must agree with the
    unrolled stepper to float64 precision — guards the tableau transcription
    and the stage-recurrence algebra."""
    sol = factory(step_size=0.03)
    tab = sol.tableau
    m = models.lotka_volterra()
    x = jnp.array([[1.3, 0.7]])
    t = jnp.asarray(0.4)
    h = sol.h

    a = jnp.array([[float(v) for v in row] for row in tab.a])
    b_sol = jnp.array([float(v) for v in tab.b_sol])
    b_err = jnp.array([float(v) for v in tab.b_err])
    c = jnp.array([float(v) for v in tab.c])
    s = tab.num_stages

    ks = jnp.zeros(x.shape + (s,))

    def node(carry, i):
        ks = carry
        xi = x + h * (ks @ a[i])
        k = m.rhs(t + c[i] * h, xi, m.params)
        return ks.at[..., i].set(k), ()

    ks, _ = jax.lax.scan(node, ks, jnp.arange(s))
    x_prop = x + h * (ks @ b_sol)
    eps_ref = jnp.abs(h * (ks @ (b_err - b_sol)))

    x_next, eps = sol.step(m.rhs, m.params, t, x)
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(x_prop), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps_ref), rtol=1e-12, atol=1e-18)
