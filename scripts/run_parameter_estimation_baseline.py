"""Filter-free parameter estimation baseline (classic trajectory fitting).

Equivalent of the reference's scripts/run_parameter_estimation_baseline.py:
integrate the ODE deterministically and score observations under fixed
Gaussian noise — no filter, no tempering, one bounded L-BFGS per restart
(all restarts batched on device here).

Usage: python run_parameter_estimation_baseline.py optimize --experiment params_baseline/lotkavolterra2
"""

import time

import numpy as np
from _common import build_x0, load_observations, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli

RESTART_CHUNK = 512


def _build_rig(cfg, dtype):
    from ode_uncertainty_tpu.inference import make_baseline_nll, make_param_spec

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    num_steps = num_steps_of(cfg, solver)
    x0_raw, x0 = build_x0(cfg, model, dtype)
    obs, has_obs = load_observations(cfg, solver, num_steps, x0.size, dtype)
    if not has_obs:
        raise ValueError("Estimation requires y_path and measurement_matrix")
    spec = make_param_spec(
        model.params, cfg["params_range"], cfg.get("params_optimized"), dtype=dtype
    )
    nll = make_baseline_nll(
        model,
        solver,
        spec,
        obs,
        cfg.get("t0", 0.0),
        x0,
        num_steps,
        x0_raw=x0_raw,
        initial_state_parametrized=cfg.get("initial_state_parametrized", False),
    )
    return model, solver, spec, obs, nll, num_steps


def optimize(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax

    from ode_uncertainty_tpu.inference import lbfgs_box
    from ode_uncertainty_tpu.utils.io import store_data

    model, solver, spec, obs, nll, num_steps = _build_rig(cfg, dtype)
    runs = cfg.get("num_random_runs", 0)
    if runs > 0:
        p0 = spec.sample_norm(jax.random.key(cfg.get("seed", 7)), runs).astype(dtype)
    else:
        p0 = spec.defaults_norm_opt().astype(dtype)[None, :]

    solve_batch = jax.jit(
        jax.vmap(
            lambda p: lbfgs_box(
                nll, p, 0.0, 1.0, max_iter=cfg.get("lbfgs_maxiter", 200), tol=cfg.get("lbfgs_tol", 1e-4)
            )
        )
    )
    t0 = time.perf_counter()
    outs = [
        jax.block_until_ready(solve_batch(p0[i : i + RESTART_CHUNK]))
        for i in range(0, p0.shape[0], RESTART_CHUNK)
    ]
    wall = time.perf_counter() - t0
    cat = lambda f: np.concatenate([np.asarray(getattr(o, f)) for o in outs])

    results = {
        "params_inits": np.asarray(spec.opt_to_physical(p0)),
        "params_optims": np.asarray(spec.opt_to_physical(cat("x"))),
        "params_default": np.asarray(spec.defaults_flat[spec.opt_indices]),
        "params_name": np.asarray(spec.opt_keys, dtype="S"),
        "nll_optims": cat("f"),
        "num_lbfgs_iters": cat("iters"),
        "num_nll_evals": cat("n_fev"),
        "num_nll_jac_evals": cat("n_fev"),
        "wall_clock_s": np.asarray(wall),
    }
    store_data(results, cfg["output"], mode="a")
    best = int(np.argmin(results["nll_optims"]))
    print(
        f"baseline optimize: {p0.shape[0]} restarts in {wall:.1f}s; best NLL "
        f"{results['nll_optims'][best]:.3f} at {results['params_optims'][best]} -> {cfg['output']}"
    )


def evaluate(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu.utils.io import store_data

    model, solver, spec, obs, nll, num_steps = _build_rig(cfg, dtype)
    evals = cfg["num_param_evals"]
    lo = np.asarray(spec.mins_flat[spec.opt_indices])
    hi = np.asarray(spec.maxs_flat[spec.opt_indices])
    axes = [np.linspace(0.0, 1.0, int(evals.get(k, 1))) for k in spec.opt_keys]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, len(axes))

    eval_batch = jax.jit(jax.vmap(nll))
    bs = cfg.get("eval_batch", 256)
    t0 = time.perf_counter()
    vals = np.concatenate(
        [np.asarray(eval_batch(jnp.asarray(grid[i : i + bs], dtype))) for i in range(0, len(grid), bs)]
    )
    wall = time.perf_counter() - t0
    per_eval_ns = wall / max(vals.size, 1) * 1e9
    store_data(
        {
            "param_evals": grid * (hi - lo) + lo,
            "nll_evals": vals[None, :],
            "timings": np.full(max(vals.size - 1, 1), per_eval_ns),
        },
        cfg["output"],
        mode="a",
    )
    print(f"baseline evaluate: {vals.size} evals in {wall:.1f}s -> {cfg['output']}")


if __name__ == "__main__":
    cfg = config_cli(
        "Filter-free parameter estimation baseline",
        positional=[("command", {"choices": ["optimize", "evaluate"]})],
    )
    (optimize if cfg["command"] == "optimize" else evaluate)(cfg)
