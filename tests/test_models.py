"""ODE model zoo unit tests: shapes, RHS values, parameter-dependent initial
values (Hodgkin-Huxley steady states), multi-compartment coupling."""

import jax.numpy as jnp
import numpy as np
import pytest

from ode_uncertainty_tpu import models


ALL_SIMPLE = [
    (models.exponential, [[1.0]]),
    (models.logistic, [[0.1]]),
    (models.lotka_volterra, [[1.0, 1.0]]),
    (models.lorenz, [[1.0, 1.0, 1.0]]),
    (models.pendulum, [[1.0], [0.0]]),
    (models.van_der_pol, [[1.0], [0.0]]),
    (models.lcao, [[1.0, 0.5], [0.0, 0.0]]),
    (models.rlc_circuit, [[10.0], [0.0]]),
]


@pytest.mark.parametrize("factory,x0", ALL_SIMPLE)
def test_rhs_shape(factory, x0):
    m = factory()
    y0 = m.build_initial_value(jnp.asarray(x0))
    assert y0.shape == (m.n_order, m.dim)
    dy = m.rhs(jnp.asarray(0.0), y0, m.params)
    assert dy.shape == (m.n_order, m.dim)
    assert jnp.all(jnp.isfinite(dy))


def test_lotka_volterra_values():
    m = models.lotka_volterra(alpha=1.5, beta=1.0, gamma=3.0, delta=1.0)
    y = jnp.array([[2.0, 3.0]])
    dy = m.rhs(0.0, y, m.params)
    # d_prey = 1.5*2 - 1*2*3 = -3 ; d_pred = 1*2*3 - 3*3 = -3
    np.testing.assert_allclose(np.asarray(dy), [[-3.0, -3.0]], rtol=1e-12)


def test_second_order_layout():
    m = models.pendulum(length=3.0)
    y = jnp.array([[0.5], [2.0]])
    dy = m.rhs(0.0, y, m.params)
    np.testing.assert_allclose(dy[0, 0], 2.0)  # d(pos)/dt = vel
    np.testing.assert_allclose(dy[1, 0], -9.81 / 3.0 * np.sin(0.5), rtol=1e-12)


def test_logistic_analytic_solution_consistency():
    m = models.logistic(growth_rate=2.0, carrying_capacity=3.0)
    ts = jnp.linspace(0.0, 2.0, 7)
    x0 = jnp.array([[0.1]])
    xs = m.solution(ts, x0, m.params)
    assert xs.shape == (7, 1)
    # derivative of the analytic solution satisfies the ODE (finite diff)
    eps = 1e-6
    xs_p = m.solution(ts + eps, x0, m.params)
    deriv_fd = (xs_p - xs) / eps
    deriv_ode = jnp.stack([m.rhs(t, x[None, :], m.params)[0] for t, x in zip(ts, xs)])
    np.testing.assert_allclose(np.asarray(deriv_fd), np.asarray(deriv_ode), rtol=1e-4)


@pytest.mark.parametrize("variant,dim", [("full", 8), ("reduced-1", 7), ("reduced-4", 4)])
def test_hh_variants(variant, dim):
    m = models.hodgkin_huxley(variant)
    assert m.dim == dim
    y0 = m.build_initial_value(jnp.array([[-70.0]]))
    assert y0.shape == (1, dim)
    # gating variables are probabilities
    assert jnp.all(y0[0, 1:] >= 0.0) and jnp.all(y0[0, 1:] <= 1.0)
    # steady state: channel derivatives vanish at the resting point (V free)
    dy = m.rhs(jnp.asarray(0.0), y0, m.params)
    np.testing.assert_allclose(np.asarray(dy[0, 1:]), 0.0, atol=1e-10)


def test_hh_input_current_window():
    from ode_uncertainty_tpu.models.hodgkin_huxley import input_current

    assert float(input_current(5.0)) == 0.0
    assert float(input_current(50.0)) == pytest.approx(210e-6)
    assert float(input_current(95.0)) == 0.0


def test_hh_rate_functions_match_naive_forms():
    """expm1-based rate laws match the naive exp(x)-1 expressions away from
    the singularity (parity with reference formulas)."""
    import importlib

    hh = importlib.import_module("ode_uncertainty_tpu.models.hodgkin_huxley")

    # grid chosen to avoid landing exactly on removable singularities,
    # where the naive form is the numerically wrong one
    v = jnp.linspace(-100.1, 39.9, 57)
    v_t = -60.0
    naive_am = -0.32 * (v - v_t - 13.0) / (jnp.exp(-(v - v_t - 13.0) / 4.0) - 1.0)
    np.testing.assert_allclose(np.asarray(hh.alpha_m(v, v_t)), np.asarray(naive_am), rtol=1e-9)
    naive_bm = 0.28 * (v - v_t - 40.0) / (jnp.exp((v - v_t - 40.0) / 5.0) - 1.0)
    np.testing.assert_allclose(np.asarray(hh.beta_m(v, v_t)), np.asarray(naive_bm), rtol=1e-9)
    naive_aq = 0.055 * (-27.0 - v) / (jnp.exp((-27.0 - v) / 3.8) - 1.0)
    np.testing.assert_allclose(np.asarray(hh.alpha_q(v)), np.asarray(naive_aq), rtol=1e-9)


def test_multicompartment_reduces_to_single_when_uncoupled():
    single = models.hodgkin_huxley("reduced-4")
    multi = models.multi_compartment_hodgkin_huxley(
        "reduced-4", num_compartments=2, coupling_coeffs=[0.0]
    )
    y0_s = single.build_initial_value(jnp.array([[-70.0]]))
    y0_m = multi.build_initial_value(jnp.array([[-70.0, -70.0]]))
    assert y0_m.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(y0_m[0, :4]), np.asarray(y0_s[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(y0_m[0, 4:]), np.asarray(y0_s[0]), rtol=1e-12)

    # Single-compartment default A differs; align params for RHS comparison.
    p_m = dict(multi.params)
    p_s = dict(single.params)
    p_m["A"] = jnp.full((2,), float(p_s["A"]))
    dy_m = multi.rhs(jnp.asarray(50.0), y0_m, p_m)
    dy_s = single.rhs(jnp.asarray(50.0), y0_s, p_s)
    np.testing.assert_allclose(np.asarray(dy_m[0, :4]), np.asarray(dy_s[0]), rtol=1e-10)


def test_multicompartment_coupling_symmetry():
    multi = models.multi_compartment_hodgkin_huxley(
        "reduced-4", num_compartments=2, coupling_coeffs=[2.0]
    )
    y0 = multi.build_initial_value(jnp.array([[-70.0, -50.0]]))
    p = multi.params
    dy = multi.rhs(jnp.asarray(0.0), y0, p)
    # coupling adds  c*(V2-V1)/C to comp 1 and c*(V1-V2)/C to comp 2
    p0 = {**p, "coupling_coeffs": jnp.zeros_like(p["coupling_coeffs"])}
    dy0 = multi.rhs(jnp.asarray(0.0), y0, p0)
    delta = np.asarray(dy - dy0)[0]
    v1, v2 = -70.0, -50.0
    np.testing.assert_allclose(delta[0], 2.0 * (v2 - v1) / 1.0, rtol=1e-10)
    np.testing.assert_allclose(delta[4], 2.0 * (v1 - v2) / 1.0, rtol=1e-10)
    np.testing.assert_allclose(delta[1:4], 0.0, atol=1e-12)
    np.testing.assert_allclose(delta[5:], 0.0, atol=1e-12)
