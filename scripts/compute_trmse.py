"""Trajectory-RMSE evaluation of estimated parameters.

Equivalent of the reference's scripts/compute_trmse.py: loads the last
tempering stage's parameter estimates from an estimation H5, re-simulates
each run's trajectory, and prints tRMSE mean±std against the true-parameter
trajectory (runs are vmapped on device).

Usage: python compute_trmse.py --experiment params/lotkavolterra2 \\
           --set parameter_estimates_input=../results/params/lotkavolterra2.h5
"""

import numpy as np
from _common import build_x0, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli


def main(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import make_param_spec, make_trmse_evaluator
    from ode_uncertainty_tpu.utils.io import load_data

    src = cfg.get("parameter_estimates_input") or cfg.get("output")
    if src is None:
        raise ValueError("parameter_estimates_input (or output) is required")
    data = load_data(src)
    params_est = np.asarray(data["params_optims"])
    if params_est.ndim == 3:  # [runs, stages, P] -> final stage
        params_est = params_est[:, -1, :]

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    num_steps = num_steps_of(cfg, solver)
    x0_raw, _ = build_x0(cfg, model, dtype)
    spec = make_param_spec(
        model.params, cfg.get("params_range", {}), cfg.get("params_optimized"), dtype=dtype
    )
    evaluate = make_trmse_evaluator(model, solver, spec, cfg.get("t0", 0.0), x0_raw, num_steps)
    vals, mean, std = evaluate(jnp.asarray(params_est, dtype))
    n_fin = int(np.isfinite(np.asarray(vals)).sum())
    suffix = "" if n_fin == len(np.asarray(vals)) else f" ({n_fin}/{len(np.asarray(vals))} runs finite)"
    print(f"tRMSE={float(mean):.2f}±{float(std):.2f}{suffix}")
    # Persist alongside the estimates so artifacts are self-describing
    # (results_inventory.py and the DESIGN tables read these back; additive
    # keys keep the reference H5 schema intact).
    from ode_uncertainty_tpu.utils.io import store_data

    store_data(
        {
            "trmse_values": np.asarray(vals, np.float64),
            "trmse_mean": np.float64(mean),
            "trmse_std": np.float64(std),
        },
        src,
        mode="a",
    )


if __name__ == "__main__":
    main(config_cli("Trajectory RMSE of estimated parameters"))
