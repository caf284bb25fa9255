"""Trajectory RMSE evaluation metric.

Re-simulates trajectories at estimated parameters and compares them to the
true-parameter trajectory (parity: /root/reference/scripts/compute_trmse.py:
104-135). The runs axis is vmapped (the reference scans it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.inference.params import ParamSpec
from ode_uncertainty_tpu.models.base import ODEModel


def trmse(traj_true: jax.Array, traj_est: jax.Array) -> jax.Array:
    """sqrt(mean_t ||x_est(t) - x_true(t)||_2^2); leading axis is time."""
    t = traj_true.shape[0]
    d = (traj_est - traj_true).reshape(t, -1)
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))


def make_trmse_evaluator(
    model: ODEModel, solver, spec: ParamSpec, t0, x0_raw, num_steps: int
):
    """Returns jitted ``evaluate(params_phys [R, P_opt]) -> (trmses [R],
    mean, std)`` against the model's default ("true") parameters."""

    def unroll_x(params):
        x0 = model.build_initial_value(x0_raw, params)
        t0_arr = jnp.asarray(t0, x0.dtype)

        def step(x, idx):
            x_next, _ = solver.step(model.rhs, params, t0_arr + idx * solver.h, x)
            return x_next, x_next

        _, xs = jax.lax.scan(step, x0, jnp.arange(num_steps))
        return xs

    @jax.jit
    def evaluate(params_phys: jax.Array):
        traj_true = unroll_x(model.params)

        def one(p_phys):
            return trmse(traj_true, unroll_x(spec.to_params(spec.physical_to_opt(p_phys))))

        vals = jax.vmap(one)(params_phys)
        # NaN-robust aggregation: diverged restarts re-simulate to NaN/Inf
        # trajectories and would otherwise poison the summary (the reference
        # tolerates this because its failed process-pool restarts return
        # zero rows instead, run_parameter_estimation.py:657-667).
        finite = jnp.isfinite(vals)
        n = jnp.maximum(jnp.sum(finite), 1)
        vals_f = jnp.where(finite, vals, 0.0)
        mean = jnp.sum(vals_f) / n
        var = jnp.sum(jnp.where(finite, (vals - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
        return vals, mean, jnp.sqrt(var)

    return evaluate
