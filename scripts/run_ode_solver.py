"""Deterministic trajectory generation (ground truth + noisy observations).

Equivalent of the reference's scripts/run_ode_solver.py: integrates an ODE
with a fixed-step embedded solver, optionally adds Gaussian observation
noise before saving, writes {t, x, eps} to H5.

Usage: python run_ode_solver.py --config ../configs/gt/lotkavolterra.yaml
"""

from _common import build_x0, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli


def main(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu.solvers import make_solve_fn
    from ode_uncertainty_tpu.utils.io import store_data

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    num_steps = num_steps_of(cfg, solver)
    save_every = cfg.get("save_interval", 1)
    _, x0 = build_x0(cfg, model, dtype)

    run = make_solve_fn(solver, model, num_steps, save_every)
    traj = run(cfg.get("t0", 0.0), x0, model.params)

    noise_var = cfg.get("noise_var", 0.0)
    if noise_var > 0.0:
        key = jax.random.key(cfg.get("seed", 7))
        traj["x"] = traj["x"] + noise_var**0.5 * jax.random.normal(
            key, traj["x"].shape, traj["x"].dtype
        )

    store_data(traj, cfg["output"])
    print(f"wrote {traj['x'].shape[0]} states -> {cfg['output']}")


if __name__ == "__main__":
    main(config_cli("Deterministic ODE solve (ground-truth generation)"))
