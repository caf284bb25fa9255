"""Round-5 kernel-parity diagnosis (VERDICT r4 items #1/#2).

The round-4 probe reported the LV Pallas kernel's gradient disagreeing with
the XLA path at max-norm rel err 6.10 (bar: 5e-2) and the HH crosscheck dying
on a remote-compile HTTP 500. This script decides whether that is (a) a real
lowering bug, (b) f32 path-divergence on ill-conditioned lanes that the
max-over-batch metric amplifies, or (c) an infra blocker — by:

  * ``lv_diag`` (TPU): both implementations at batch 1024, per-lane error
    QUANTILES instead of a bare max, plus an npz capture (params, values,
    grads, observations) for the CPU oracle;
  * ``--mode oracle`` (CPU, f64): recompute the worst + random lanes in
    float64 from the captured observations and report each f32 path's error
    against the f64 truth — if both paths straddle f64 comparably, the
    mismatch is conditioning, not a kernel bug;
  * ``hh ladder`` (TPU): the implicit-kernel crosscheck at escalating
    (steps, batch) sizes, each cell in its own child process so a remote
    compiler crash yields a record instead of killing the probe.

Usage:
  python scripts/tpu_probe_r5.py                 # TPU leg (lv_diag + hh)
  ODEUQ_PLATFORM=cpu python scripts/tpu_probe_r5.py --mode oracle
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPZ = os.path.join(REPO, "results", "diag_lv_r5.npz")

LV_STEPS = 2000
LV_H = 0.01
LV_OBS_EVERY = 10
LV_NOISE = 0.1


def _lv_obs_spec(dtype):
    """The exact LV estimation rig bench._build uses (bench.py:113-135),
    returning (obs, spec, nll, x0) — re-derived here so the observation
    rows can be captured for the f64 oracle."""
    import jax.numpy as jnp

    from ode_uncertainty_tpu import models, solvers
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
    from ode_uncertainty_tpu.ops import const_diag

    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=LV_H)
    x0 = jnp.array([[1.0, 1.0]], dtype)
    gt = solvers.solve(sol, m, 0.0, x0, LV_STEPS)
    idx = np.arange(LV_OBS_EVERY, LV_STEPS + 1, LV_OBS_EVERY)
    rng = np.random.default_rng(0)
    ys_raw = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys_raw = ys_raw + np.sqrt(LV_NOISE) * rng.standard_normal(ys_raw.shape)
    t_obs = np.asarray(gt["t"])[idx]
    obs = make_obs_model(np.eye(2), t_obs, ys_raw, LV_NOISE, 0.0, LV_H, LV_STEPS, dtype=dtype)
    spec = make_param_spec(
        m.params, {k: (0.1, 5.0) for k in m.params},
        {"alpha": True, "beta": True, "gamma": False, "delta": False}, dtype=dtype,
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-12, dtype), obs.obs_dim)
    nll = make_nll(m, sol, ekf, spec, obs, state0, LV_STEPS)
    return m, sol, ekf, obs, spec, state0, nll, t_obs, ys_raw


def _quantiles(e):
    e = np.asarray(e, np.float64)
    return {
        "p50": float(np.quantile(e, 0.5)),
        "p90": float(np.quantile(e, 0.9)),
        "p99": float(np.quantile(e, 0.99)),
        "max": float(e.max()),
    }


def probe_lv_diag(batch=1024):
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu.ops.pallas_ekf import make_nll_pallas

    dtype = jnp.float32
    m, sol, ekf, obs, spec, state0, nll, t_obs, ys_raw = _lv_obs_spec(dtype)
    q = np.eye(2)
    gam = jnp.asarray(0.01, dtype)

    p0 = spec.sample_norm(jax.random.key(0), batch).astype(dtype)

    vg_x = jax.jit(jax.vmap(jax.value_and_grad(lambda p: nll(p, jnp.asarray(q, dtype), gam))))
    vx, gx = jax.block_until_ready(vg_x(p0))

    nll_pl = make_nll_pallas(m, sol, ekf, spec, obs, state0, LV_STEPS, q)

    @jax.jit
    def vg_p(pb):
        vals, vjp = jax.vjp(lambda x: nll_pl(x, gam), pb)
        return vals, vjp(jnp.ones_like(vals))[0]

    vp, gp = jax.block_until_ready(vg_p(p0))

    vx_n, vp_n = np.asarray(vx, np.float64), np.asarray(vp, np.float64)
    gx_n, gp_n = np.asarray(gx, np.float64), np.asarray(gp, np.float64)

    err_v = np.abs(vx_n - vp_n) / (np.abs(vx_n) + 1.0)
    # per-lane: worst param-component error, normalized by the lane's own
    # gradient scale (the round-4 metric normalized per COMPONENT, so a lane
    # with one tiny component and one huge one scored as a 6.1x error)
    gscale = np.abs(gx_n).max(axis=1)
    err_g = np.abs(gx_n - gp_n).max(axis=1) / (gscale + 1e-3)

    worst = np.argsort(err_g)[::-1][:8].tolist()
    rng = np.random.default_rng(1)
    sample = rng.choice(batch, 8, replace=False).tolist()
    lanes = sorted(set(worst + sample))

    os.makedirs(os.path.dirname(NPZ), exist_ok=True)
    np.savez(
        NPZ,
        p0=np.asarray(p0), vx=vx_n, vp=vp_n, gx=gx_n, gp=gp_n,
        err_v=err_v, err_g=err_g, lanes=np.asarray(lanes),
        t_obs=np.asarray(t_obs, np.float64), ys=np.asarray(ys_raw, np.float64),
    )
    print(json.dumps({
        "probe": "lv_diag", "batch": batch,
        "err_val": _quantiles(err_v), "err_grad": _quantiles(err_g),
        "worst_lanes": worst,
        "worst_val_nll": [float(vx_n[i]) for i in worst],
        "worst_gscale": [float(gscale[i]) for i in worst],
        "npz": NPZ,
    }), flush=True)


def oracle():
    """CPU f64 recompute of the captured lanes; prints each f32 path's error
    against the f64 truth."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ode_uncertainty_tpu import models, solvers
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
    from ode_uncertainty_tpu.ops import const_diag

    d = np.load(NPZ)
    lanes = d["lanes"].tolist()
    dtype = jnp.float64

    # rebuild the rig from the CAPTURED observations (bit-identical data to
    # what both f32 paths filtered; only arithmetic precision differs)
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=LV_H)
    x0 = jnp.array([[1.0, 1.0]], dtype)
    obs = make_obs_model(
        np.eye(2), d["t_obs"], d["ys"], LV_NOISE, 0.0, LV_H, LV_STEPS, dtype=dtype
    )
    spec = make_param_spec(
        m.params, {k: (0.1, 5.0) for k in m.params},
        {"alpha": True, "beta": True, "gamma": False, "delta": False}, dtype=dtype,
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-12, dtype), obs.obs_dim)
    nll = make_nll(m, sol, ekf, spec, obs, state0, LV_STEPS)

    p_sel = jnp.asarray(d["p0"][lanes], dtype)
    q = jnp.eye(2, dtype=dtype)
    gam = jnp.asarray(0.01, dtype)
    vg = jax.jit(jax.vmap(jax.value_and_grad(lambda p: nll(p, q, gam))))
    v64, g64 = jax.block_until_ready(vg(p_sel))
    v64, g64 = np.asarray(v64), np.asarray(g64)

    rows = []
    for k, i in enumerate(lanes):
        gs = np.abs(g64[k]).max() + 1e-3
        rows.append({
            "lane": int(i),
            "nll_f64": float(v64[k]),
            "val_err_xla": float(abs(d["vx"][i] - v64[k]) / (abs(v64[k]) + 1.0)),
            "val_err_pallas": float(abs(d["vp"][i] - v64[k]) / (abs(v64[k]) + 1.0)),
            "grad_err_xla": float(np.abs(d["gx"][i] - g64[k]).max() / gs),
            "grad_err_pallas": float(np.abs(d["gp"][i] - g64[k]).max() / gs),
            "grad_f64_scale": float(np.abs(g64[k]).max()),
        })
    print(json.dumps({"probe": "lv_oracle", "rows": rows}, indent=1), flush=True)


def hh_cell(steps, batch):
    """One implicit-kernel crosscheck cell (runs inside a child process)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_pallas_ekf import _hh_rig

    from ode_uncertainty_tpu.ops.pallas_ekf import make_nll_pallas

    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, n_steps = _hh_rig(
        dtype, num_steps=steps, variant="full"
    )
    n = state0.x.size
    nll_pl = make_nll_pallas(m, sol, ekf, spec, obs, state0, n_steps, np.eye(n))
    p0 = spec.sample_norm(jax.random.key(0), batch).astype(dtype)
    gam = jnp.asarray(0.01, dtype)
    q = jnp.eye(n, dtype=dtype)

    vg_ref = jax.jit(jax.vmap(jax.value_and_grad(lambda p: nll(p, q, gam))))
    vals_ref, g_ref = jax.block_until_ready(vg_ref(p0))

    @jax.jit
    def vg_pl(pb):
        vals, vjp = jax.vjp(lambda x: nll_pl(x, gam), pb)
        return vals, vjp(jnp.ones_like(vals))[0]

    vals_pl, g_pl = jax.block_until_ready(vg_pl(p0))
    vx, vp = np.asarray(vals_ref, np.float64), np.asarray(vals_pl, np.float64)
    gx, gp = np.asarray(g_ref, np.float64), np.asarray(g_pl, np.float64)
    err_v = np.abs(vx - vp) / (np.abs(vx) + 1.0)
    gscale = np.abs(gx).max(axis=1)
    err_g = np.abs(gx - gp).max(axis=1) / (gscale + 1e-3)
    t0 = time.perf_counter()
    jax.block_until_ready(vg_pl(p0))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "probe": "hh_pallas_crosscheck", "steps": steps, "batch": batch,
        "rel_err_val": float(err_v.max()), "rel_err_grad": float(err_g.max()),
        "err_val_q": _quantiles(err_v), "err_grad_q": _quantiles(err_g),
        "pallas_steps_per_sec": round(steps * batch / dt, 0),
    }), flush=True)


def probe_hh_ladder(cells=((100, 256), (200, 1024))):
    """Escalating crosscheck cells, each in its own child (a remote-compile
    crash then yields a record for that cell only)."""
    for steps, batch in cells:
        rec = {"probe": "hh_pallas_crosscheck", "steps": steps, "batch": batch}
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", "hhcell", "--steps", str(steps), "--batch", str(batch)],
                capture_output=True, text=True, timeout=2400,
                cwd=REPO,
            )
            emitted = False
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    emitted = True
            if not emitted:
                rec["error"] = (out.stdout + out.stderr)[-400:]
                print(json.dumps(rec), flush=True)
                time.sleep(240)  # runtime recovery after a dead client
                return  # don't escalate past a failing cell
        except subprocess.TimeoutExpired:
            rec["error"] = "timeout(2400s)"
            print(json.dumps(rec), flush=True)
            time.sleep(240)
            return


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="tpu", choices=["tpu", "oracle", "hhcell"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip", default="", help="comma list: lv,hh")
    args = ap.parse_args()
    sys.path.insert(0, REPO)

    if args.mode == "oracle":
        oracle()
    elif args.mode == "hhcell":
        import bench

        bench._enable_compile_cache()
        hh_cell(args.steps, args.batch)
    else:
        import bench

        bench._enable_compile_cache()
        skip = set(args.skip.split(","))
        if "lv" not in skip:
            probe_lv_diag()
        if "hh" not in skip:
            probe_hh_ladder()
