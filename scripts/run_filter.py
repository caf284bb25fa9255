"""Probabilistic ODE solution: SQRT-EKF or particle-filter trajectory.

Equivalent of the reference's scripts/run_filter.py: runs the filter over
the time grid, correcting against H5 observations when provided (prediction
only otherwise), and stores the state trajectory. ``use_static_cov_fn``
switches to the Conrad-style fixed-noise baseline.

Usage: python run_filter.py --config ../configs/ekf_trajectory_conrad_baseline/rkf45/lotkavolterra.yaml
"""

import dataclasses

from _common import build_p0_sqrt, build_x0, load_observations, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli


def main(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu.filters import (
        DenseEKF,
        GMMSqrtEKF,
        ParticleFilter,
        SqrtEKF,
        SqrtUKF,
        UKF,
    )
    from ode_uncertainty_tpu.inference import (
        make_dense_run,
        make_ekf_run,
        make_ekf_run_static,
        make_gmm_run,
        make_pf_run,
    )
    from ode_uncertainty_tpu.utils.io import store_data

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    flt = cfg["filter_builder"]
    num_steps = num_steps_of(cfg, solver)
    save_every = cfg.get("save_interval", 1)
    _, x0 = build_x0(cfg, model, dtype)
    n = x0.size

    obs, has_obs = load_observations(cfg, solver, num_steps, n, dtype)

    if isinstance(flt, ParticleFilter):
        state0 = flt.init_state(cfg.get("t0", 0.0), x0, jax.random.key(cfg.get("seed", 7)))
        run = make_pf_run(flt, solver, model, num_steps, save_every)
        _, traj = run(state0, model.params)
        out = {"t": traj.t, "x": traj.x, "eps": traj.eps}
    elif isinstance(flt, (SqrtEKF, SqrtUKF)):
        p0_sqrt = build_p0_sqrt(cfg, n, dtype)
        state0 = flt.init_state(cfg.get("t0", 0.0), x0, p0_sqrt, obs.obs_dim)
        if cfg.get("use_static_cov_fn", False):
            scale = getattr(getattr(flt, "static_cov_update", None), "scale", 1.0)
            run = make_ekf_run_static(flt, solver, model, num_steps, save_every)
            _, traj = run(state0, model.params, jnp.asarray(scale, dtype), obs)
        else:
            zero_q = jnp.zeros((n, n), dtype)
            run = make_ekf_run(flt, solver, model, num_steps, save_every)
            _, traj = run(state0, model.params, zero_q, jnp.zeros((), dtype), obs)
        out = dataclasses.asdict(traj)
        # constant noise configuration, stored for reference-schema parity
        out["Q_sqrt"] = jnp.zeros((n, n), dtype)
        out["gamma_sqrt"] = jnp.zeros((), dtype)
        out["R_sqrt"] = obs.R_sqrt
    elif isinstance(flt, (DenseEKF, UKF)):
        p0_sqrt = build_p0_sqrt(cfg, n, dtype)
        state0 = flt.init_state(cfg.get("t0", 0.0), x0, p0_sqrt @ p0_sqrt.T, obs.obs_dim)
        run = make_dense_run(flt, solver, model, num_steps, save_every)
        _, traj = run(state0, model.params, jnp.zeros((n, n), dtype), jnp.zeros((), dtype), obs)
        out = dataclasses.asdict(traj)
    elif isinstance(flt, GMMSqrtEKF):
        p0_sqrt = build_p0_sqrt(cfg, n, dtype)
        state0 = flt.init_state(cfg.get("t0", 0.0), x0, p0_sqrt)
        run = make_gmm_run(flt, solver, model, num_steps, save_every)
        _, traj = run(state0, model.params, jnp.zeros((n, n), dtype), jnp.zeros((), dtype), obs)
        out = dataclasses.asdict(traj)
    else:
        raise TypeError(f"Unsupported filter: {type(flt)}")

    store_data(out, cfg["output"])
    print(f"wrote trajectory ({num_steps} steps, obs={has_obs}) -> {cfg['output']}")


if __name__ == "__main__":
    main(config_cli("Probabilistic ODE solve (filter trajectory)"))
