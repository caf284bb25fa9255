"""Headline benchmark: the north-star estimation kernel on TPU.

Workload (per BASELINE.json / VERDICT round 1): one NLL+gradient evaluation
of the square-root EKF over the full Hodgkin-Huxley ``full`` problem —
n=8 state, 11 optimized parameters, Kvaerno3 (ESDIRK) implicit steps with
Newton stage solves, tN=100 at h=0.01 (10^4 filter steps), a voltage
observation at every step — batched over restarts. This is the
per-iteration cost of the tempered L-BFGS on the hardest shipped experiment
(configs/params/hodgkinhuxley11_full), i.e. the kernel that dominates
end-to-end estimation wall-clock.

vs_baseline: ratio against the single-chain, float64 CPU evaluation of the
same kernel — the reference's execution model (one scipy L-BFGS-B restart
per process on CPU, scripts/run_parameter_estimation.py:266-272). The
reference publishes no numbers and its pinned deps (diffrax/jaxopt/...) are
not installed here (BASELINE.md), so the stand-in baseline is measured at
bench time with identical numerics on this host's CPU.

Prints exactly ONE JSON line, unconditionally:

  * healthy run — fresh measurement, and `.bench_cache.json` is updated;
  * unreachable/flaky TPU or blown deadline — the last-good measurement
    from `.bench_cache.json` with ``"stale": true`` and a reason, instead
    of timing out silently (the round-3 failure mode: a dead backend ate
    4 x 240 s of backoff plus a full CPU baseline and the driver killed the
    run with no number at all).

Orchestration on the single-chip pool (utils/runlock.py): the bench takes
an exclusive lock that all long-running TPU clients honor at checkpointed
iteration boundaries, waits for the active client to yield, and only then
probes the backend. The CPU baseline is cached in the sidecar keyed by a
hash of the kernel sources, so repeat runs skip straight to the TPU
measurement.

Set ODEUQ_BENCH=lv for the round-1 explicit (RKF45, Lotka-Volterra) kernel.
"""

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SIDECAR = os.path.join(REPO, ".bench_cache.json")

# Workload scales mirror the shipped experiment configs
# (configs/experiments.py params/hodgkinhuxley11_full, params/lotkavolterra2).
WORKLOADS = {
    # Batch default is re-probed per round (ODEUQ_BENCH_BATCH overrides):
    # the round-4 probe measured the xla implicit NLL+grad healthy and 17%
    # faster at 512 vs 256; with the platform-aware HH expm1 (Kahan form on
    # TPU, models/hodgkin_huxley.py:_expm1) the same kernel measures
    # 1,688.3k steps/s at 512 (6.2x over the native-expm1 lowering) with
    # identical numerics. The historical crash cells were xla_remat /
    # vmapped-while programs, and measure_tpu halves the batch on any
    # crashed attempt, so 512 degrades to the proven 256 rather than
    # failing.
    "hh_full": dict(steps=10000, h=0.01, batch=512, tpu_reps=3, cpu_reps=3, cpu_steps=1000),
    "lv": dict(steps=2000, h=0.01, batch=8192, tpu_reps=5, cpu_reps=3, cpu_steps=2000),
}

_DEADLINE = None  # wall-clock budget, set in main()


def _remaining() -> float:
    return float("inf") if _DEADLINE is None else _DEADLINE - time.monotonic()


def _build(workload, dtype_str, batch, steps=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu import models, solvers
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
    from ode_uncertainty_tpu.ops import const_diag

    w = WORKLOADS[workload]
    num_steps = steps or w["steps"]
    h = w["h"]
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32

    if workload == "hh_full":
        m = models.hodgkin_huxley("full")
        # ODEUQ_SDIRK_REMAT=1: rematerialize the stage-solve inverse in the
        # backward pass (A/B knob; see solvers/sdirk.py:_make_stage_solver).
        sol = solvers.kvaerno3(
            step_size=h,
            remat_stage_inverse=os.environ.get("ODEUQ_SDIRK_REMAT") == "1",
        )
        x0 = m.build_initial_value(jnp.array([[-70.0]], dtype), m.params).astype(dtype)
        n = 8
        h_mat = np.zeros((1, n))
        h_mat[0, 0] = 1.0
        obs_every = 1
        noise = 0.1
        # Exactly the params/hodgkinhuxley11_full surface (11 optimized).
        opt = {
            k: k in ("g_Na", "E_Na", "g_K", "E_K", "g_leak", "E_leak", "V_T", "g_M", "g_L", "E_Ca", "g_T")
            for k in m.params
        }
        rng_lo_hi = {
            "C": (0.4, 3.0), "A": (1.9e-5, 3.02e-4), "g_Na": (0.5, 80.0), "E_Na": (50.0, 100.0),
            "g_K": (1e-4, 15.0), "E_K": (-110.0, -70.0), "g_leak": (1e-4, 0.6),
            "E_leak": (-100.0, -35.0), "V_T": (-90.0, -40.0), "g_M": (1e-4, 0.6),
            "tau_max": (50.0, 5000.0), "g_L": (-1e-4, 0.6), "E_Ca": (100.0, 150.0),
            "g_T": (-1e-4, 0.6), "V_x": (0.0, 4.0),
        }
    else:
        m = models.lotka_volterra()
        sol = solvers.rkf45(step_size=h)
        x0 = jnp.array([[1.0, 1.0]], dtype)
        n = 2
        h_mat = np.eye(2)
        obs_every = 10
        noise = 0.1
        opt = {"alpha": True, "beta": True, "gamma": False, "delta": False}
        rng_lo_hi = {k: (0.1, 5.0) for k in m.params}

    gt = solvers.solve(sol, m, 0.0, x0, num_steps)
    idx = np.arange(obs_every, num_steps + 1, obs_every)
    rng = np.random.default_rng(0)
    # Full-state rows + noise; the obs model applies the measurement matrix
    # itself (same schema as results/noise_gt H5 files).
    ys_raw = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys_raw = ys_raw + np.sqrt(noise) * rng.standard_normal(ys_raw.shape)
    obs = make_obs_model(h_mat, np.asarray(gt["t"])[idx], ys_raw, noise, 0.0, h, num_steps, dtype=dtype)
    spec = make_param_spec(m.params, rng_lo_hi, opt, dtype=dtype)
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(n, 1e-12, dtype), obs.obs_dim)
    nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps)
    q = jnp.diag(jnp.ones(n, dtype))
    gam = jnp.asarray(0.01, dtype)

    # The explicit LV workload runs the fused Pallas kernel on TPU (the
    # hand-scheduled forward + recompute backward, ops/pallas_ekf.py); set
    # ODEUQ_LV_IMPL=xla to measure the lax.scan/checkpoint path instead.
    # Default justified by the round-5 f64 oracle (results/probe_r5.json,
    # DESIGN §11c): the kernel's gradients are MORE accurate vs f64 than the
    # XLA path's on the worst-disagreement lanes, and it is 19x faster.
    # The implicit HH workload defaults to the XLA path; ODEUQ_HH_IMPL=pallas
    # selects the fused SDIRK kernel (same kernel family, Kvaerno3 tile step).
    impl = os.environ.get(
        "ODEUQ_LV_IMPL" if workload == "lv" else "ODEUQ_HH_IMPL",
        "pallas" if workload == "lv" else "xla",
    )
    if (
        batch > 1
        and impl == "pallas"
        and dtype_str == "f32"
        and jax.default_backend() != "cpu"
    ):
        from ode_uncertainty_tpu.ops.pallas_ekf import make_nll_pallas, supports

        if supports(m, sol, ekf, obs):
            nll_b = make_nll_pallas(
                m, sol, ekf, spec, obs, state0, num_steps, np.asarray(q)
            )

            @jax.jit
            def fn(p_b):
                vals, vjp = jax.vjp(lambda pb: nll_b(pb, gam), p_b)
                return vals, vjp(jnp.ones_like(vals))[0]

            p = spec.sample_norm(jax.random.key(0), batch).astype(dtype)
            return fn, p, num_steps

    vg = jax.value_and_grad(lambda p: nll(p, q, gam))
    if batch > 1:
        fn = jax.jit(jax.vmap(vg))
        p = spec.sample_norm(jax.random.key(0), batch).astype(dtype)
    else:
        fn = jax.jit(vg)
        p = spec.defaults_norm_opt().astype(dtype) * 0.9

    return fn, p, num_steps


def _time_evals(fn, p, reps):
    import jax

    jax.block_until_ready(fn(p))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(p)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_tpu(workload):
    import jax

    assert jax.default_backend() != "cpu", f"expected accelerator, got {jax.default_backend()}"
    w = WORKLOADS[workload]
    batch = int(os.environ.get("ODEUQ_BENCH_BATCH", w["batch"]))
    fn, p, num_steps = _build(workload, "f32", batch)
    dt = _time_evals(fn, p, w["tpu_reps"])
    return num_steps * batch / dt


# ---------------------------------------------------------------------------
# sidecar: cached CPU baseline + last-good result
# ---------------------------------------------------------------------------


def _load_sidecar() -> dict:
    try:
        with open(SIDECAR) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_sidecar(data: dict) -> None:
    tmp = SIDECAR + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, SIDECAR)
    except OSError:
        pass


def _kernel_fingerprint(workload: str) -> str:
    """Hash of everything that defines the measured kernels (this file and
    the package sources); the cached CPU baseline is valid only while it
    matches, so a kernel change re-measures and a no-op rerun is instant."""
    h = hashlib.sha256()
    h.update(repr(sorted(WORKLOADS[workload].items())).encode())
    pkg = os.path.join(REPO, "ode_uncertainty_tpu")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fname in sorted(files):
            if fname.endswith(".py"):
                fp = os.path.join(root, fname)
                h.update(fp.encode())
                with open(fp, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


# ---------------------------------------------------------------------------
# fail-fast backend probe + client quiesce
# ---------------------------------------------------------------------------


def _parse_probe(stdout: str, stderr: str) -> tuple[bool, str]:
    for line in stdout.splitlines():
        if line.startswith("PROBE_OK"):
            plat = line.split()[1]
            if plat == "cpu":
                return False, "backend resolved to cpu (no accelerator visible)"
            return True, plat
    return False, (stderr or stdout)[-300:].replace("\n", " | ")


def probe_tpu_backend(timeout_s: float, _code: str | None = None) -> tuple[bool, str]:
    """Initializes the TPU backend in a child process with a hard timeout.
    A dead/unreachable pool fails here in seconds-to-minutes instead of
    after the full CPU baseline + four 240 s backoffs (round-3 post-mortem,
    VERDICT r3 'What's weak' #1)."""
    code = _code or "import jax; d = jax.devices(); print('PROBE_OK', d[0].platform, len(d))"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=max(timeout_s, 5.0),
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s:.0f}s (claim-wait or dead tunnel)"
    return _parse_probe(out.stdout, out.stderr)


def quiesce_clients(wait_s: float) -> None:
    """Takes the bench lock and waits for the registered TPU client (if any)
    to yield at its next checkpointed iteration; escalates to SIGTERM then
    SIGKILL — safe, the clients persist full optimizer state every
    iteration and their babysitters relaunch after the lock clears."""
    from ode_uncertainty_tpu.utils import runlock

    runlock.acquire_bench_lock()
    pid = runlock.active_client_pid()
    if pid is None:
        return
    print(f"# bench: waiting for TPU client pid={pid} to yield", file=sys.stderr)
    deadline = time.monotonic() + max(wait_s, 10.0)
    term_at = deadline - 35.0
    termed = False
    while time.monotonic() < deadline:
        if runlock.active_client_pid() is None:
            return
        if not termed and time.monotonic() >= term_at:
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError:
                return
            termed = True
        time.sleep(2.0)
    try:
        os.kill(pid, signal.SIGKILL)
    except OSError:
        pass
    time.sleep(2.0)


# ---------------------------------------------------------------------------
# measurements (each in a fresh child process)
# ---------------------------------------------------------------------------


def measure_tpu_subprocess(workload):
    """TPU measurement in a child process, halving the batch on a crashed
    attempt (the remote runtime intermittently kills very wide grad
    programs). Backoff between attempts is a short fixed pause (20 s, total
    <= 60 s across the ladder — the old 240 s x 4 schedule alone blew the
    driver budget); the overall wall-clock deadline set in main() bounds
    every attempt. Returns steps/sec or raises."""
    w = WORKLOADS[workload]
    batch = int(os.environ.get("ODEUQ_BENCH_BATCH", w["batch"]))
    last_err = None
    first = True
    while batch >= 32:
        budget = _remaining() - 30.0
        if budget <= 60.0:
            raise RuntimeError(f"bench deadline reached; last error: {last_err}")
        if not first:
            time.sleep(20.0)  # brief runtime-recovery pause after a dead client
        first = False
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "import bench\n"
            "bench._enable_compile_cache()\n"
            f"print('TPU_STEPS_PER_SEC=' + str(bench.measure_tpu({workload!r})))\n"
        )
        env = dict(os.environ)
        env["ODEUQ_BENCH_BATCH"] = str(batch)
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, env=env, timeout=min(3600.0, budget),
            )
            for line in out.stdout.splitlines():
                if line.startswith("TPU_STEPS_PER_SEC="):
                    return float(line.split("=")[1])
            last_err = (out.stdout + out.stderr)[-500:]
        except subprocess.TimeoutExpired:
            last_err = f"timeout at batch {batch}"
        print(f"# bench: TPU attempt at batch {batch} failed; backing off", file=sys.stderr)
        batch //= 2
    raise RuntimeError(f"all TPU bench attempts failed: {last_err}")


def measure_cpu_subprocess(workload):
    """Single-chain f64 CPU kernel in a fresh process (the reference's
    execution model), returns steps/sec. For the implicit HH workload a
    shorter horizon is timed (cost is linear in steps; full horizon is
    minutes per grad on one CPU chain)."""
    w = WORKLOADS[workload]
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import bench\n"
        "bench._enable_compile_cache()\n"
        f"fn, p, steps = bench._build({workload!r}, 'f64', 1, steps={w['cpu_steps']})\n"
        f"dt = bench._time_evals(fn, p, {w['cpu_reps']})\n"
        "print('CPU_STEPS_PER_SEC=' + str(steps / dt))\n"
    )
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("CPU_STEPS_PER_SEC="):
            return float(line.split("=")[1])
    raise RuntimeError(f"CPU baseline failed:\n{out.stdout}\n{out.stderr}")


def cpu_baseline(workload: str, sidecar: dict) -> float:
    """Cached single-chain f64 baseline: re-measured only when the kernel
    sources change (fingerprint mismatch) or no cache exists."""
    fp = _kernel_fingerprint(workload)
    entry = sidecar.get("cpu_baseline", {}).get(workload)
    if entry and entry.get("fingerprint") == fp:
        return float(entry["steps_per_sec"])
    sps = measure_cpu_subprocess(workload)
    sidecar.setdefault("cpu_baseline", {})[workload] = {
        "fingerprint": fp,
        "steps_per_sec": sps,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _save_sidecar(sidecar)
    return sps


def _metric_name(workload: str) -> str:
    return (
        "hh_full_implicit_nll_grad_filter_steps_per_sec_batched"
        if workload == "hh_full"
        else "sqrt_ekf_nll_grad_filter_steps_per_sec_batched"
    )


def _emit_stale(workload: str, sidecar: dict, reason: str) -> int:
    """Last-good measurement, flagged stale — ALWAYS a parsable line."""
    lg = sidecar.get("last_good", {}).get(workload)
    if not lg:
        print(json.dumps({
            "metric": _metric_name(workload), "value": 0.0,
            "unit": "filter_steps/s", "vs_baseline": 0.0,
            "stale": True, "stale_reason": f"{reason}; no last-good record",
        }))
        return 0
    print(json.dumps({
        "metric": lg.get("metric", _metric_name(workload)),
        "value": lg["value"],
        "unit": lg.get("unit", "filter_steps/s"),
        "vs_baseline": lg["vs_baseline"],
        "stale": True,
        "stale_reason": reason,
        "measured_at": lg.get("measured_at"),
    }))
    return 0


def _enable_compile_cache():
    """Persistent compilation cache: the HH-full NLL+grad program takes tens
    of minutes to compile on the remote-TPU stack (measured ~40 min); with
    the cache, a pre-warmed run makes subsequent bench invocations start in
    seconds."""
    import jax

    cache_dir = os.environ.get("ODEUQ_JAX_CACHE", os.path.expanduser("~/.jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> int:
    global _DEADLINE
    sys.path.insert(0, REPO)
    _enable_compile_cache()
    _DEADLINE = time.monotonic() + float(os.environ.get("ODEUQ_BENCH_DEADLINE_S", "2700"))
    workload = os.environ.get("ODEUQ_BENCH", "hh_full")
    sidecar = _load_sidecar()

    from ode_uncertainty_tpu.utils import runlock

    try:
        quiesce_clients(float(os.environ.get("ODEUQ_BENCH_QUIESCE_S", "600")))

        ok, info = probe_tpu_backend(float(os.environ.get("ODEUQ_BENCH_PROBE_S", "300")))
        if not ok:
            return _emit_stale(workload, sidecar, f"TPU backend unreachable: {info}")

        cpu_sps = cpu_baseline(workload, sidecar)
        tpu_sps = measure_tpu_subprocess(workload)
        result = {
            "metric": _metric_name(workload),
            "value": round(tpu_sps, 1),
            "unit": "filter_steps/s",
            "vs_baseline": round(tpu_sps / cpu_sps, 2),
        }
        print(json.dumps(result))
        sidecar.setdefault("last_good", {})[workload] = {
            **result,
            "cpu_steps_per_sec": cpu_sps,
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _save_sidecar(sidecar)
        return 0
    except Exception as e:  # any failure still yields a parsable line
        return _emit_stale(workload, sidecar, f"{type(e).__name__}: {e}")
    finally:
        runlock.release_bench_lock()


if __name__ == "__main__":
    sys.exit(main())
