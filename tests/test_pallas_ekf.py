"""Fused Pallas explicit-path NLL vs the XLA fast path (interpret mode).

The kernel must reproduce inference/nll.py's uniform-observation fast path
(value AND gradient) — same square-root EKF math, hand-scheduled. These
tests run the kernel in Pallas interpreter mode on CPU against the vmapped
XLA NLL on identical inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ode_uncertainty_tpu import models, solvers
from ode_uncertainty_tpu.filters import SqrtEKF
from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
from ode_uncertainty_tpu.ops import const_diag
from ode_uncertainty_tpu.ops.pallas_ekf import TILE, make_nll_pallas, supports


def _lv_rig(dtype, num_steps=80, obs_every=10, noise=0.01):
    m = models.lotka_volterra()
    h = 0.01
    sol = solvers.rkf45(step_size=h)
    x0 = jnp.array([[1.0, 1.0]], dtype)
    gt = solvers.solve(sol, m, 0.0, x0, num_steps)
    idx = np.arange(obs_every, num_steps + 1, obs_every)
    rng = np.random.default_rng(0)
    ys = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys = ys + np.sqrt(noise) * rng.standard_normal(ys.shape)
    obs = make_obs_model(
        np.eye(2), np.asarray(gt["t"])[idx], ys, noise, 0.0, h, num_steps, dtype=dtype
    )
    spec = make_param_spec(
        m.params,
        {k: (0.1, 5.0) for k in m.params},
        {"alpha": True, "beta": True, "gamma": False, "delta": False},
        dtype=dtype,
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-6, dtype), 2)
    nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
    return m, sol, ekf, spec, obs, state0, nll, num_steps


@pytest.mark.parametrize("gamma", [0.1, 0.0])
def test_pallas_nll_matches_xla_fast_path(gamma):
    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, num_steps = _lv_rig(dtype)
    assert supports(m, sol, ekf, obs)
    q = jnp.eye(2, dtype=dtype)

    nll_pl = make_nll_pallas(
        m, sol, ekf, spec, obs, state0, num_steps, np.eye(2), interpret=True
    )

    b = 16  # < TILE: exercises padding
    p0 = spec.sample_norm(jax.random.key(0), b).astype(dtype)
    gam = jnp.asarray(gamma, dtype)

    ref = jax.vmap(lambda p: nll(p, q, gam))(p0)
    got = nll_pl(p0, gam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-4)


def test_pallas_grad_matches_xla_fast_path():
    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, num_steps = _lv_rig(dtype)
    q = jnp.eye(2, dtype=dtype)
    nll_pl = make_nll_pallas(
        m, sol, ekf, spec, obs, state0, num_steps, np.eye(2), interpret=True
    )

    b = 8
    p0 = spec.sample_norm(jax.random.key(1), b).astype(dtype)
    gam = jnp.asarray(0.05, dtype)

    g_ref = jax.vmap(jax.grad(lambda p: nll(p, q, gam)))(p0)
    g_got = jax.grad(lambda p: jnp.sum(nll_pl(p, gam)))(p0)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=5e-3, atol=5e-4
    )


def test_pallas_grad_finite_at_zero_gamma():
    # The final tempering stage runs gamma == 0 exactly; the guarded QR must
    # keep gradients finite (the f32 NaN trap of docs/DESIGN.md §6).
    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, num_steps = _lv_rig(dtype)
    nll_pl = make_nll_pallas(
        m, sol, ekf, spec, obs, state0, num_steps, np.eye(2), interpret=True
    )
    p0 = spec.sample_norm(jax.random.key(2), 4).astype(dtype)
    g = jax.grad(lambda p: jnp.sum(nll_pl(p, jnp.asarray(0.0, dtype))))(p0)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_gamma_gradient():
    # gamma is traced (the tempering loop differentiates nothing through it
    # today, but the custom VJP must still return the true cotangent).
    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, num_steps = _lv_rig(dtype)
    q = jnp.eye(2, dtype=dtype)
    nll_pl = make_nll_pallas(
        m, sol, ekf, spec, obs, state0, num_steps, np.eye(2), interpret=True
    )
    p0 = spec.sample_norm(jax.random.key(3), 4).astype(dtype)

    dg_ref = jax.grad(
        lambda g: jnp.sum(jax.vmap(lambda p: nll(p, q, g))(p0))
    )(jnp.asarray(0.2, dtype))
    dg_got = jax.grad(lambda g: jnp.sum(nll_pl(p0, g)))(jnp.asarray(0.2, dtype))
    np.testing.assert_allclose(float(dg_got), float(dg_ref), rtol=2e-3)
