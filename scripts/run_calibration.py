"""Calibration comparison: static noise sweep vs local-error covariance.

Equivalent of the reference's run_calibration_conrad_baseline_calibration.py:
computes the filter's mean innovation NLL across ``num_noise_levels`` static
process-noise magnitudes (Conrad baseline) and for the local-error update
("ours"); the noise-level axis is vmapped (the reference scans 500 levels).

Usage: python run_calibration.py --experiment calibration/rkf45/lotkavolterra
"""

import numpy as np
from _common import build_p0_sqrt, build_x0, load_observations, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli


def main(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import make_calibration
    from ode_uncertainty_tpu.utils.io import store_data

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    ekf = cfg["filter_builder"]
    num_steps = num_steps_of(cfg, solver)
    _, x0 = build_x0(cfg, model, dtype)
    n = x0.size
    obs, has_obs = load_observations(cfg, solver, num_steps, n, dtype)
    if not has_obs:
        raise ValueError("Calibration requires y_path (ground-truth observations)")

    p0_sqrt = build_p0_sqrt(cfg, n, dtype)
    state0 = ekf.init_state(cfg.get("t0", 0.0), x0, p0_sqrt, obs.obs_dim)
    calibrate = make_calibration(ekf, solver, model, obs, state0, num_steps)

    levels = jnp.logspace(
        cfg.get("min_noise_log", -3.0),
        cfg.get("max_noise_log", 1.0),
        cfg.get("num_noise_levels", 100),
        dtype=dtype,
    )
    nll_static, nll_local = calibrate(model.params, levels)
    store_data(
        {
            "noise_levels": np.asarray(levels),
            "nll_conrad": np.asarray(nll_static),
            "nll_ours": np.asarray(nll_local),
        },
        cfg["output"],
    )
    print(
        f"calibration: {levels.shape[0]} levels; best static NLL "
        f"{float(np.min(np.asarray(nll_static))):.4f}, local-error NLL "
        f"{float(nll_local):.4f} -> {cfg['output']}"
    )


if __name__ == "__main__":
    main(config_cli("Static-noise calibration sweep vs local-error covariance"))
