"""Tempered ODE parameter estimation (the framework's centerpiece).

Equivalent of the reference's scripts/run_parameter_estimation.py, with the
process pool and the scipy L-BFGS-B host round-trip replaced by one batched
on-device program (inference/estimate.py). Subcommands:

  optimize  — tempered MLE from random restarts; H5 schema matches the
              reference (params_inits/optims, nll_optims, iteration counters)
  evaluate  — NLL landscape over a parameter grid per tempering stage

Usage:
  python run_parameter_estimation.py optimize --experiment params/lotkavolterra2
  python run_parameter_estimation.py evaluate --config cfg.yaml --set num_random_runs=512
"""

import time

import numpy as np
from _common import build_p0_sqrt, build_x0, load_observations, num_steps_of, setup_precision

from ode_uncertainty_tpu.utils.config import config_cli, parse_literal

# Restart batches beyond this are processed in sequential host chunks (very
# wide vmapped while-loops can exceed runtime limits on some TPU stacks).
RESTART_CHUNK = 512


def _build_rig(cfg, dtype):
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import make_nll, make_param_spec

    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    ekf = cfg["filter_builder"]
    num_steps = num_steps_of(cfg, solver)
    x0_raw, x0 = build_x0(cfg, model, dtype)
    n = x0.size
    obs, has_obs = load_observations(cfg, solver, num_steps, n, dtype)
    if not has_obs:
        raise ValueError("Estimation requires y_path and measurement_matrix")

    spec = make_param_spec(
        model.params, cfg["params_range"], cfg.get("params_optimized"), dtype=dtype
    )
    p0_sqrt = build_p0_sqrt(cfg, n, dtype)
    state0 = ekf.init_state(cfg.get("t0", 0.0), x0, p0_sqrt, obs.obs_dim)
    nll = make_nll(
        model,
        solver,
        ekf,
        spec,
        obs,
        state0,
        num_steps,
        x0_raw=x0_raw,
        initial_state_parametrized=cfg.get("initial_state_parametrized", False),
        parameter_sensitivity=cfg.get("parameter_sensitivity", False),
        fast_path=cfg.get("nll_fast_path", True),
    )
    # absent/null weights mean unmasked tempering noise (the reference's
    # params_baseline configs carry no gamma_noise_weights key)
    w_raw = parse_literal(cfg.get("gamma_noise_weights"))
    w = jnp.ones(n, dtype) if w_raw is None else jnp.asarray(w_raw, dtype)
    q_sqrt = jnp.diag(w)
    return model, solver, spec, ekf, obs, state0, nll, q_sqrt, num_steps


def _gammas(cfg, dtype):
    import jax.numpy as jnp

    sched = cfg["gamma_noise_schedule"]
    return sched.gammas(
        cfg.get("num_tempering_stages", 10), cfg.get("final_gamma_zero", True)
    ).astype(dtype)


def _initial_restarts(cfg, spec, dtype):
    import jax

    runs = cfg.get("num_random_runs", 0)
    if runs > 0:
        return spec.sample_norm(jax.random.key(cfg.get("seed", 7)), runs).astype(dtype)
    return spec.defaults_norm_opt().astype(dtype)[None, :]


def _optimize_checkpointed(cfg, stage_opt, spec, p0, gammas):
    """Runs the (restart-chunk x tempering-stage) grid with a durable sidecar
    checkpoint and per-unit progress lines (utils/checkpoint.py)."""
    from ode_uncertainty_tpu.utils.checkpoint import run_stage_grid

    return run_stage_grid(
        cfg["output"],
        p0,
        gammas,
        stage_opt,
        spec.opt_to_physical,
        chunk=int(cfg.get("restart_chunk", RESTART_CHUNK)),
        resume=cfg.get("resume", True),
        tag=str(cfg.get("tag", cfg["output"])),
    )


def optimize(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import make_tempered_estimator
    from ode_uncertainty_tpu.utils.io import store_data

    model, solver, spec, ekf, obs, state0, nll, q_sqrt, num_steps = _build_rig(cfg, dtype)
    gammas = _gammas(cfg, dtype)
    p0 = _initial_restarts(cfg, spec, dtype)

    from ode_uncertainty_tpu.inference import EstimationResult
    from ode_uncertainty_tpu.inference.estimate import make_stage_optimizer
    from ode_uncertainty_tpu.inference.lbfgs_host import make_stage_optimizer_host

    # One tempering stage of one restart chunk is the checkpoint unit: the
    # TPU tunnel in this environment kills long-lived client sessions (~10
    # min), so progress must be durable at finer granularity than a full
    # (restarts x stages) sweep.
    #
    # Optimizer mode: the host-driven strong-Wolfe L-BFGS is the default —
    # it matches scipy L-BFGS-B's convergence quality (LV2: NLL 648.56,
    # hit-rate 1.00, vs 651.13/0.00 for the Armijo-only device loop; see
    # scripts/compare_optimizer.py + docs/DESIGN.md) and its loop-free
    # device programs are the only shape the remote-TPU runtime executes
    # reliably (the on-device vmap(while(grad(scan))) path kernel-faults at
    # any batch width there). "device" selects the on-device while-loop
    # (the sharded multi-chip estimator's building block).
    mode = cfg.get("optimizer_mode", "host")

    use_host = mode != "device"
    if use_host:
        # Opt-in fused Pallas NLL for explicit problems (--set nll_impl=pallas):
        # the batched dispatch becomes the hand-scheduled kernel of
        # ops/pallas_ekf.py (TPU only; falls back if unsupported).
        nll_b = None
        if cfg.get("nll_impl") == "pallas":
            import jax as _jax

            from ode_uncertainty_tpu.ops.pallas_ekf import make_nll_pallas, supports

            if _jax.default_backend() != "cpu" and supports(
                model, solver, ekf, obs
            ):
                nll_b = make_nll_pallas(
                    model, solver, ekf, spec, obs, state0, num_steps,
                    np.asarray(q_sqrt),
                )
                print("[optimize] using fused Pallas NLL kernel", flush=True)
        stage_opt = make_stage_optimizer_host(
            nll,
            q_sqrt,
            nll_batched=nll_b,
            max_iter=cfg.get("lbfgs_maxiter", 200),
            tol=cfg.get("lbfgs_tol", 1e-4),
            # Iteration-granular optimizer-state checkpointing: hour-scale
            # stages survive tunnel/babysitter kills (resumed mid-stage).
            state_prefix=str(cfg["output"]),
            # Per-iteration heartbeat: implicit-solver iterations run
            # minutes each; watchdogs treat long silence as a wedged client.
            progress_every=int(cfg.get("lbfgs_progress_every", 1)),
        )
    else:
        stage_opt = make_stage_optimizer(
            nll,
            q_sqrt,
            max_iter=cfg.get("lbfgs_maxiter", 200),
            tol=cfg.get("lbfgs_tol", 1e-4),
        )

    t_start = time.perf_counter()
    merged = _optimize_checkpointed(cfg, stage_opt, spec, p0, gammas)
    wall = time.perf_counter() - t_start
    fields = ("params_inits", "params_optims", "nll_optims", "num_lbfgs_iters", "num_nll_evals")
    res = EstimationResult(*[merged[f] for f in fields], gammas=np.asarray(gammas))

    results = {
        "params_inits": res.params_inits,
        "params_optims": res.params_optims,
        "params_default": np.asarray(spec.defaults_flat[spec.opt_indices]),
        "params_name": np.asarray(spec.opt_keys, dtype="S"),
        "nll_optims": res.nll_optims,
        "num_lbfgs_iters": res.num_lbfgs_iters,
        "num_nll_evals": res.num_nll_evals,
        # value_and_grad evaluates jointly on-device; counters coincide
        "num_nll_jac_evals": res.num_nll_evals,
        "gammas": res.gammas,
        "wall_clock_s": np.asarray(wall),
    }
    store_data(results, cfg["output"], mode="a")
    final_nll = np.asarray(results["nll_optims"][:, -1], np.float64)
    # diverged restarts leave NaN rows; pick the best finite one
    best = int(np.nanargmin(np.where(np.isfinite(final_nll), final_nll, np.inf)))
    print(
        f"optimize: {p0.shape[0]} restarts x {len(gammas)} stages in {wall:.1f}s; "
        f"best NLL {results['nll_optims'][best, -1]:.3f} at "
        f"{results['params_optims'][best, -1]} -> {cfg['output']}"
    )


def evaluate(cfg) -> None:
    dtype = setup_precision(cfg)
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import make_nll_landscape
    from ode_uncertainty_tpu.utils.io import store_data

    model, solver, spec, ekf, obs, state0, nll, q_sqrt, num_steps = _build_rig(cfg, dtype)
    gammas = _gammas(cfg, dtype)

    evals = cfg["num_param_evals"]
    lo = np.asarray(spec.mins_flat[spec.opt_indices])
    hi = np.asarray(spec.maxs_flat[spec.opt_indices])
    axes = [
        np.linspace(0.0, 1.0, int(evals.get(k, 1)))
        for k in spec.opt_keys
    ]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, len(axes))
    grid_j = jnp.asarray(grid, dtype)

    batch_times: list = []
    landscape = make_nll_landscape(
        nll, q_sqrt, batch_size=cfg.get("eval_batch", 256), timings_out=batch_times
    )
    t0 = time.perf_counter()
    vals = np.asarray(landscape(grid_j, gammas))
    wall = time.perf_counter() - t0
    per_eval_ns = wall / max(vals.size, 1) * 1e9

    # Per-eval timings from the measured per-batch dispatch times: each grid
    # point carries its own batch's amortized ns (first batch includes the
    # jit compile, matching how the reference's first timed eval does).
    timings = np.concatenate(
        [np.full(npts, sec / max(npts, 1) * 1e9) for npts, sec in batch_times]
    ) if batch_times else np.full(max(vals.size, 1), per_eval_ns)

    results = {
        "param_evals": grid * (hi - lo) + lo,
        "nll_evals": vals,
        "gammas": np.asarray(gammas),
        "timings": timings[1:] if timings.size > 1 else timings,
    }
    store_data(results, cfg["output"], mode="a")
    print(
        f"evaluate: {vals.shape[1]} grid points x {vals.shape[0]} stages in {wall:.1f}s "
        f"({per_eval_ns:.0f} ns/eval amortized) -> {cfg['output']}"
    )


if __name__ == "__main__":
    cfg = config_cli(
        "Tempered ODE parameter estimation",
        positional=[("command", {"choices": ["optimize", "evaluate"]})],
    )
    (optimize if cfg["command"] == "optimize" else evaluate)(cfg)
