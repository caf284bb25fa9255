"""Round-3 TPU measurement batch (run when the chip is free).

One process, sequential probes, each printed as a JSON line:
  1. verify-drive: deterministic solve + stiff implicit + HH spike (the
     /verify skill's TPU leg).
  2. LV explicit NLL+grad: XLA fast path vs fused Pallas kernel at batch
     8192 (plus a numerical cross-check at small batch).
  3. HH-full implicit NLL+grad batch sweep (128/256/512): validates the
     bench.py default batch and locates the crash boundary.

Usage: timeout 3600 python scripts/tpu_probe_r3.py [--skip hh] > probe.log
"""

import argparse
import json
import sys
import time

import numpy as np


def _bench_build(workload, batch, steps=None):
    sys.path.insert(0, "/root/repo")
    import bench

    return bench._build(workload, "f32", batch, steps=steps)


def _time(fn, p, reps, warm=1):
    import jax

    for _ in range(warm):
        jax.block_until_ready(fn(p))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(p)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe_verify():
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu import models, solvers

    assert jax.default_backend() != "cpu"
    out = solvers.solve(
        solvers.dopri65(step_size=0.01), models.lotka_volterra(), 0.0,
        jnp.array([[1.0, 1.0]], jnp.float32), 2000, save_every=10,
    )
    xf = np.asarray(out["x"])[-1].ravel()
    assert np.allclose(xf, [1.0577, 0.8287], atol=5e-3), xf

    vdp = models.van_der_pol(damping=50.0)
    imp = solvers.solve(
        solvers.kvaerno3(step_size=0.05), vdp, 0.0,
        jnp.array([[2.0], [0.0]], jnp.float32), 400,
    )
    assert np.isfinite(np.asarray(imp["x"])).all()

    hh = models.hodgkin_huxley("full")
    x0 = hh.build_initial_value(jnp.array([[-70.0]], jnp.float32), hh.params)
    sol_hh = solvers.solve(solvers.kvaerno3(step_size=0.01), hh, 0.0, x0, 5000, save_every=10)
    vmax = float(np.asarray(sol_hh["x"])[:, 0, 0].max())
    assert vmax > 0.0, vmax
    print(json.dumps({"probe": "verify_tpu", "lv_final": xf.tolist(), "hh_vmax": vmax, "ok": True}), flush=True)


def _lane_errs(vx, vp, gx, gp):
    """Per-LANE error metrics between two f32 paths, as quantile dicts.

    Normalization is by each lane's own gradient scale (max |component|),
    not per component: the round-4 per-component metric scored a lane with
    one O(1e-3) component next to an O(1e4) one as a "6.1x" error. The
    round-5 f64 oracle (results/probe_r5.json, scripts/tpu_probe_r5.py
    --mode oracle) showed that on exactly those worst lanes the Pallas
    kernel was the MORE accurate path (grad err vs f64: pallas 2.1e-3 max
    vs xla 6.3e-2) — the f32-vs-f32 disagreement tail is dominated by the
    XLA path's own checkpoint/chunk-schedule divergence, so the headline
    assertion metric is the p99, with a looser bound on the max."""
    vx, vp = np.asarray(vx, np.float64), np.asarray(vp, np.float64)
    gx, gp = np.asarray(gx, np.float64), np.asarray(gp, np.float64)
    # NaN-aware: random HH-full parameter draws legitimately diverge on some
    # lanes (the filter saturates; the f64 oracle confirms entry NaN — DESIGN
    # §11d), in which case BOTH paths must flag the lane. Errors are compared
    # on the jointly finite lanes; finiteness-mask disagreement is reported
    # separately and asserted in tests/test_tpu_hardware.py.
    fin_x = np.isfinite(vx) & np.isfinite(gx).all(axis=1)
    fin_p = np.isfinite(vp) & np.isfinite(gp).all(axis=1)
    both = fin_x & fin_p
    err_v = np.abs(vx[both] - vp[both]) / (np.abs(vx[both]) + 1.0)
    err_g = (np.abs(gx[both] - gp[both]).max(axis=1)
             / (np.abs(gx[both]).max(axis=1) + 1e-3))
    return {
        "rel_err_val": float(np.quantile(err_v, 0.99)),
        "rel_err_grad": float(np.quantile(err_g, 0.99)),
        "rel_err_val_max": float(err_v.max()),
        "rel_err_grad_max": float(err_g.max()),
        "lanes": int(vx.size),
        "finite_xla": int(fin_x.sum()),
        "finite_pallas": int(fin_p.sum()),
        "finite_mask_mismatch": int((fin_x != fin_p).sum()),
    }


def probe_lv(batch=8192):
    import os

    import jax

    steps = 2000
    # numerical cross-check pallas vs xla at small batch
    os.environ["ODEUQ_LV_IMPL"] = "xla"
    fn_x, p_x, _ = _bench_build("lv", 1024)
    os.environ["ODEUQ_LV_IMPL"] = "pallas"
    fn_p, p_p, _ = _bench_build("lv", 1024)
    vx, gx = jax.block_until_ready(fn_x(p_x))
    vp, gp = jax.block_until_ready(fn_p(p_p))
    print(json.dumps({"probe": "lv_crosscheck", **_lane_errs(vx, vp, gx, gp)}), flush=True)

    for impl in ("xla", "pallas"):
        os.environ["ODEUQ_LV_IMPL"] = impl
        fn, p, _ = _bench_build("lv", batch)
        dt = _time(fn, p, reps=3)
        print(json.dumps({
            "probe": f"lv_{impl}", "batch": batch,
            "steps_per_sec": round(steps * batch / dt, 0), "sec_per_eval": round(dt, 4),
        }), flush=True)


def probe_hh_pallas_crosscheck(num_steps=200, batch=1024):
    """Implicit (Kvaerno3, HH-full) Pallas kernel vs the XLA NLL on TPU:
    value + grad agreement at a short horizon, then a short-horizon timing."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from test_pallas_ekf import _hh_rig

    from ode_uncertainty_tpu.ops.pallas_ekf import make_nll_pallas

    dtype = jnp.float32
    m, sol, ekf, spec, obs, state0, nll, n_steps = _hh_rig(
        dtype, num_steps=num_steps, variant="full"
    )
    n = state0.x.size
    nll_pl = make_nll_pallas(m, sol, ekf, spec, obs, state0, n_steps, np.eye(n))
    p0 = spec.sample_norm(jax.random.key(0), batch).astype(dtype)
    gam = jnp.asarray(0.01, dtype)
    q = jnp.eye(n, dtype=dtype)

    vg_ref = jax.jit(jax.vmap(jax.value_and_grad(lambda p: nll(p, q, gam))))
    vals_ref, g_ref = vg_ref(p0)

    @jax.jit
    def vg_pl(pb):
        vals, vjp = jax.vjp(lambda x: nll_pl(x, gam), pb)
        return vals, vjp(jnp.ones_like(vals))[0]

    vals_pl, g_pl = vg_pl(p0)
    errs = _lane_errs(vals_ref, vals_pl, g_ref, g_pl)
    dt_ref = _time(vg_ref, p0, reps=3)
    dt_pl = _time(vg_pl, p0, reps=3)
    print(json.dumps({
        "probe": "hh_pallas_crosscheck", "steps": n_steps, "batch": batch,
        **errs,
        "xla_steps_per_sec": round(n_steps * batch / dt_ref, 0),
        "pallas_steps_per_sec": round(n_steps * batch / dt_pl, 0),
    }), flush=True)


def probe_hh(batches=(128, 256, 512)):
    """Bench-horizon (10k steps) implicit NLL+grad: XLA path batch sweep
    (crash boundary for the bench batch), the SDIRK stage-inverse remat A/B,
    and the fused Pallas kernel at the same shapes — the numbers that decide
    the ODEUQ_HH_IMPL default.

    Each (impl, batch) cell runs in its OWN child process: this sweep
    deliberately probes the remote runtime's crash boundary, and a killed
    TPU client takes its whole process down — in-process, one crashed cell
    would lose every remaining cell. Cells are ordered most-important-first
    so an outer timeout still captures the bench-batch validation."""
    import os
    import subprocess

    steps = 10000
    cells = [(impl, b) for b in batches for impl in ("xla", "xla_remat", "pallas")]
    # bench-batch validation first, crash-boundary exploration last
    cells.sort(key=lambda c: (c[1], ("xla", "xla_remat", "pallas").index(c[0])))
    for impl, b in cells:
        env = dict(os.environ)
        env["ODEUQ_HH_IMPL"] = "pallas" if impl == "pallas" else "xla"
        env.pop("ODEUQ_SDIRK_REMAT", None)
        if impl == "xla_remat":
            env["ODEUQ_SDIRK_REMAT"] = "1"
        code = (
            "import sys, time; sys.path.insert(0, '/root/repo')\n"
            "import jax, bench\n"
            "bench._enable_compile_cache()\n"
            f"fn, p, _ = bench._build('hh_full', 'f32', {b})\n"
            "jax.block_until_ready(fn(p))\n"
            "t0 = time.perf_counter()\n"
            "for _ in range(3): out = fn(p)\n"
            "jax.block_until_ready(out)\n"
            "print('DT=' + str((time.perf_counter() - t0) / 3))\n"
        )
        rec = {"probe": "hh_full", "impl": impl, "batch": b}
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, env=env, timeout=3000,
            )
            dt = None
            for line in out.stdout.splitlines():
                if line.startswith("DT="):
                    dt = float(line.split("=")[1])
            if dt is not None:
                rec.update(steps_per_sec=round(steps * b / dt, 0), sec_per_eval=round(dt, 2))
            else:
                rec["error"] = (out.stdout + out.stderr)[-300:]
        except subprocess.TimeoutExpired:
            rec["error"] = f"timeout(3000s) at batch {b}"
        print(json.dumps(rec), flush=True)
        if "error" in rec:
            time.sleep(240)  # runtime recovery window after a dead client


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: verify,lv,hh")
    ap.add_argument("--hh-batches", default="128,256,512")
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    sys.path.insert(0, "/root/repo")
    import bench as _b

    _b._enable_compile_cache()
    if "verify" not in skip:
        probe_verify()
    if "lv" not in skip:
        probe_lv()
    if "hhpallas" not in skip:
        try:
            probe_hh_pallas_crosscheck()
        except Exception as e:
            print(json.dumps({"probe": "hh_pallas_crosscheck", "error": repr(e)[:300]}), flush=True)
    if "hh" not in skip:
        probe_hh([int(x) for x in args.hh_batches.split(",")])
