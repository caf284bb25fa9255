"""Optimizer-quality parity: our L-BFGS vs scipy L-BFGS-B.

The reference's tempering scheme was tuned against scipy's L-BFGS-B
(strong-Wolfe line search; reference run_parameter_estimation.py:599 via
jaxopt.ScipyBoundedMinimize). This script measures, on the same jitted NLL
objective and the same random restarts:

  * restart hit-rate (fraction of restarts whose final-stage NLL lands
    within `hit_tol` of the per-method best),
  * best/median final NLL,
  * parameter recovery error of the best restart vs ground truth,
  * NLL evaluations per restart (cost proxy).

for three optimizers:

  scipy   — scipy.optimize.minimize(method="L-BFGS-B") per restart per
            stage, driving the jitted single-sample value_and_grad (the
            reference's execution model),
  host    — inference/lbfgs_host.py (batched, host-driven loop),
  device  — inference/lbfgs.py (batched on-device while-loop).

Runs on CPU float64 by default (scipy needs f64; fairness). Usage:

  python compare_optimizer.py --experiment params/lotkavolterra2 \
      [--restarts 64] [--markdown]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("ODEUQ_PLATFORM", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup_precision  # noqa: E402  (sets sys.path for the repo)


def run_scipy(vg_single, p0, gammas, maxiter):
    """Per-restart, per-stage scipy L-BFGS-B (the reference's loop)."""
    from scipy.optimize import minimize

    r, p_dim = p0.shape
    out = np.empty_like(p0)
    fvals = np.empty(r)
    nfev = np.zeros(r, np.int64)
    for i in range(r):
        x = p0[i].copy()
        for g in gammas:
            res = minimize(
                lambda q, gg=g: tuple(map(np.asarray, vg_single(q, gg))),
                x,
                jac=True,
                method="L-BFGS-B",
                bounds=[(0.0, 1.0)] * p_dim,
                options={"maxiter": maxiter},
            )
            x = np.clip(res.x, 0.0, 1.0)
            nfev[i] += res.nfev
        out[i] = x
        fvals[i] = res.fun
    return out, fvals, nfev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="params/lotkavolterra2")
    ap.add_argument("--restarts", type=int, default=64)
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--hit-tol", type=float, default=1.0, help="NLL units above best that count as a hit")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--skip", default="", help="comma list of methods to skip")
    args = ap.parse_args()

    from configs import experiments

    cfg_raw = experiments.build(args.experiment)
    cfg_raw["float64"] = True
    cfg_raw["num_random_runs"] = args.restarts
    from ode_uncertainty_tpu.utils.config import apply_runtime_config, instantiate

    # Platform/precision pins MUST precede instantiate: building model/
    # solver objects creates jax arrays, which freezes the backend choice
    # (and the axon sitecustomize would freeze it to the remote TPU).
    apply_runtime_config(cfg_raw)
    cfg = {k: instantiate(v) for k, v in cfg_raw.items()}
    dtype = setup_precision(cfg)

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} x64={jax.config.read('jax_enable_x64')}", flush=True)
    assert jax.default_backend() == "cpu", "parity comparison must run on CPU"

    from run_parameter_estimation import _build_rig, _gammas, _initial_restarts

    model, solver, spec, ekf, obs, state0, nll, q_sqrt, num_steps = _build_rig(cfg, dtype)
    gammas = np.asarray(_gammas(cfg, dtype))
    p0 = np.asarray(_initial_restarts(cfg, spec, dtype), np.float64)

    vg = jax.jit(jax.value_and_grad(lambda p, g: nll(p, q_sqrt, jnp.sqrt(g))))
    vg_single = lambda q, g: vg(jnp.asarray(q, dtype), jnp.asarray(g, dtype))

    results = {}
    skip = set(args.skip.split(",")) if args.skip else set()

    if "scipy" not in skip:
        t0 = time.perf_counter()
        x, f, nfev = run_scipy(vg_single, p0, gammas, args.maxiter)
        results["scipy L-BFGS-B"] = (x, f, nfev, time.perf_counter() - t0)

    if "host" not in skip:
        from ode_uncertainty_tpu.inference.lbfgs_host import make_stage_optimizer_host

        stage = make_stage_optimizer_host(nll, q_sqrt, max_iter=args.maxiter, tol=1e-6)
        t0 = time.perf_counter()
        x = p0.copy()
        nfev = np.zeros(args.restarts, np.int64)
        for g in gammas:
            res = stage(x, g)
            x = res.x
            nfev += res.n_fev
        results["host L-BFGS (ours)"] = (x, res.f, nfev, time.perf_counter() - t0)

    if "device" not in skip:
        from ode_uncertainty_tpu.inference.estimate import make_stage_optimizer

        stage = make_stage_optimizer(nll, q_sqrt, max_iter=args.maxiter, tol=1e-6)
        t0 = time.perf_counter()
        x = jnp.asarray(p0, dtype)
        nfev = np.zeros(args.restarts, np.int64)
        for g in gammas:
            res = stage(x, jnp.asarray(g, dtype))
            x = res.x
            nfev += np.asarray(res.n_fev)
        results["device L-BFGS (ours)"] = (
            np.asarray(x, np.float64),
            np.asarray(res.f, np.float64),
            nfev,
            time.perf_counter() - t0,
        )

    # Ground truth in normalized coordinates for recovery error.
    truth_norm = np.asarray(spec.defaults_norm_opt(), np.float64)
    best_f_global = min(np.min(f) for _, f, _, _ in results.values())

    rows = []
    for name, (x, f, nfev, wall) in results.items():
        hit = float(np.mean(f <= best_f_global + args.hit_tol))
        b = int(np.argmin(f))
        perr = float(np.max(np.abs(x[b] - truth_norm)))
        rows.append(
            (name, hit, float(np.min(f)), float(np.median(f)), perr, float(np.mean(nfev)), wall)
        )

    hdr = ("method", "hit_rate", "best_nll", "median_nll", "best_param_err", "mean_nll_evals", "wall_s")
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            print(
                f"| {r[0]} | {r[1]:.2f} | {r[2]:.3f} | {r[3]:.3f} | {r[4]:.4f} | {r[5]:.0f} | {r[6]:.1f} |"
            )
    else:
        print(f"{args.experiment}: {args.restarts} restarts, {len(gammas)} stages, hit_tol={args.hit_tol}")
        for r in rows:
            print(
                f"  {r[0]:<22} hit={r[1]:.2f} best={r[2]:.3f} med={r[3]:.3f} "
                f"perr={r[4]:.4f} nfev={r[5]:.0f} wall={r[6]:.1f}s"
            )


if __name__ == "__main__":
    main()
