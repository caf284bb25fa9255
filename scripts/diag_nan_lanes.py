"""Classify the flagship's diverged restarts (VERDICT r4 weak #3).

7/100 HH-full restarts ended NaN (results/params/hodgkinhuxley11_full.h5).
The H5's per-stage NLL + iteration counts show the signature: every NaN
stage with num_lbfgs_iters == 1 failed on its FIRST objective evaluation,
i.e. the NLL at the stage-entry parameters is itself non-finite — not a
line-search wall or a runtime fault. This script re-evaluates exactly those
entry points on CPU in both f32 and f64 (forward value only, no grad) and
prints a classification per lane:

  - f32 NaN / f64 finite  -> f32 numerics (filter sqrt-covariance overflow)
  - f32 NaN / f64 NaN     -> genuinely divergent filter at that parameter
                             point (matches the reference's degenerate
                             restarts, run_parameter_estimation.py:657-667)

Run:  ODEUQ_PLATFORM=cpu python diag_nan_lanes.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_nll(dtype_str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if dtype_str == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from _common import build_p0_sqrt, build_x0, load_observations, num_steps_of
    from ode_uncertainty_tpu.inference import make_nll, make_param_spec
    from ode_uncertainty_tpu.utils.config import apply_runtime_config, instantiate

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "configs"))
    import experiments

    raw = experiments.build("params/hodgkinhuxley11_full")
    apply_runtime_config(raw)
    cfg = {k: instantiate(v) for k, v in raw.items()}
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    ekf = cfg["filter_builder"]
    num_steps = num_steps_of(cfg, solver)
    x0_raw, x0 = build_x0(cfg, model, dtype)
    n = x0.size
    obs, _ = load_observations(cfg, solver, num_steps, n, dtype)
    spec = make_param_spec(
        model.params, cfg["params_range"], cfg.get("params_optimized"), dtype=dtype
    )
    p0_sqrt = build_p0_sqrt(cfg, n, dtype)
    state0 = ekf.init_state(cfg.get("t0", 0.0), x0, p0_sqrt, obs.obs_dim)
    nll = make_nll(model, solver, ekf, spec, obs, state0, num_steps)
    q = jnp.eye(n, dtype=dtype)

    def eval_batch(p_phys, gamma):
        import jax

        p_norm = spec.physical_to_opt(jnp.asarray(p_phys, dtype))
        return jax.jit(jax.vmap(lambda p: nll(p, q, jnp.asarray(gamma, dtype))))(p_norm)

    return eval_batch


def main():
    import h5py

    f = h5py.File(os.path.join(os.path.dirname(__file__), "..",
                               "results/params/hodgkinhuxley11_full.h5"), "r")
    nll_h = f["nll_optims"][:]
    gammas = f["gammas"][:]
    inits = f["params_inits"][:]
    optims = f["params_optims"][:]
    bad = np.where(~np.isfinite(nll_h[:, -1]))[0]

    # stage-entry params of each lane's FIRST NaN stage
    cases = []
    for i in bad:
        s = int(np.argmax(~np.isfinite(nll_h[i])))
        entry = inits[i] if s == 0 else optims[i, s - 1]
        cases.append((int(i), s, entry, float(gammas[s])))

    out = {}
    for tag in ("f32", "f64"):
        ev = build_nll(tag)
        vals = []
        for i, s, entry, gam in cases:
            v = float(np.asarray(ev(entry[None, :], gam))[0])
            vals.append(v)
        out[tag] = vals

    print(f"{'lane':>5} {'stage':>5} {'gamma':>9} {'nll_f32':>14} {'nll_f64':>14}  classification")
    for k, (i, s, _, gam) in enumerate(cases):
        v32, v64 = out["f32"][k], out["f64"][k]
        if not np.isfinite(v32) and np.isfinite(v64):
            cls = "f32-numerics"
        elif not np.isfinite(v64):
            cls = "divergent-filter (param point)"
        else:
            cls = "finite-on-reeval (runtime/optimizer state)"
        print(f"{i:>5} {s:>5} {gam:>9.4g} {v32:>14.6g} {v64:>14.6g}  {cls}")


if __name__ == "__main__":
    main()
