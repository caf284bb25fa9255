"""Mesh-sharding tests on the virtual 8-device CPU mesh: the sharded
tempered estimator must agree with the unsharded one and actually place the
restart axis across devices."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from ode_uncertainty_tpu import models, solvers
from ode_uncertainty_tpu.filters import SqrtEKF
from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec, make_tempered_estimator
from ode_uncertainty_tpu.ops import const_diag
from ode_uncertainty_tpu.parallel import (
    device_mesh,
    make_sharded_tempered_estimator,
    restart_sharding,
    shard_restarts,
)


def _rig():
    m = models.lotka_volterra()
    h = 0.05
    num_steps = 100
    sol = solvers.rkf45(step_size=h)
    x0 = jnp.array([[1.0, 1.0]])
    gt = solvers.solve(sol, m, 0.0, x0, num_steps)
    idx = np.arange(10, num_steps + 1, 10)
    ys_raw = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    obs = make_obs_model(np.eye(2), np.asarray(gt["t"])[idx], ys_raw, 0.01, 0.0, h, num_steps, dtype=jnp.float64)
    spec = make_param_spec(
        m.params,
        {k: (0.1, 5.0) for k in m.params},
        {"alpha": True, "beta": True, "gamma": False, "delta": False},
        dtype=jnp.float64,
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-6), 2)
    nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
    return spec, nll


def test_sharded_estimator_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    spec, nll = _rig()
    q_sqrt = jnp.eye(2, dtype=jnp.float64)
    gammas = jnp.array([1e-2, 0.0])
    p0 = spec.sample_norm(random.key(0), 16).astype(jnp.float64)

    plain = make_tempered_estimator(nll, spec, q_sqrt, max_iter=15, tol=1e-8)
    res_plain = plain(p0, gammas)

    mesh = device_mesh(num_devices=8)
    sharded = make_sharded_tempered_estimator(nll, spec, q_sqrt, mesh, max_iter=15, tol=1e-8)
    res_sharded = sharded(shard_restarts(p0, mesh), gammas)

    # restart axis is genuinely sharded over the mesh
    assert res_sharded.params_optims.sharding == restart_sharding(mesh)
    np.testing.assert_allclose(
        np.asarray(res_sharded.params_optims), np.asarray(res_plain.params_optims), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.nll_optims), np.asarray(res_plain.nll_optims), rtol=1e-9
    )


def test_shard_restarts_places_leading_axis():
    mesh = device_mesh(num_devices=8)
    x = jnp.arange(32.0).reshape(32, 1)
    y = shard_restarts(x, mesh)
    assert len({d for d in y.sharding.device_set}) == 8
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_sharded_host_wolfe_matches_unsharded():
    """The production (host strong-Wolfe) stage optimizer with a mesh shards
    every vg dispatch over the restart axis and must agree exactly with the
    unsharded host loop — same math, host bookkeeping unchanged."""
    from ode_uncertainty_tpu.inference.lbfgs_host import make_stage_optimizer_host

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    spec, nll = _rig()
    q_sqrt = jnp.eye(2, dtype=jnp.float64)
    # 20 restarts: NOT divisible by 8 — GSPMD padding must handle it.
    p0 = spec.sample_norm(random.key(2), 20).astype(jnp.float64)

    plain = make_stage_optimizer_host(nll, q_sqrt, max_iter=12, tol=1e-8)
    mesh = device_mesh(num_devices=8)
    sharded = make_stage_optimizer_host(nll, q_sqrt, max_iter=12, tol=1e-8, mesh=mesh)

    r_plain = plain(p0, 1e-2)
    r_sharded = sharded(p0, 1e-2)
    np.testing.assert_allclose(r_sharded.x, r_plain.x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r_sharded.f, r_plain.f, rtol=1e-12)
    np.testing.assert_array_equal(r_sharded.n_fev, r_plain.n_fev)
