"""Headline benchmark: batched square-root-EKF filter throughput on TPU.

Metric (per BASELINE.json): EKF filter steps/sec on the parameter-estimation
inner kernel — one NLL+gradient evaluation of the square-root EKF over the
full time grid, batched over restarts. This is the per-iteration cost of the
tempered L-BFGS that dominates end-to-end estimation wall-clock.

vs_baseline: ratio against the single-chain, float64 CPU evaluation of the
same kernel — the reference's execution model (one scipy L-BFGS-B restart
per process on CPU, scripts/run_parameter_estimation.py:266-272). The
reference publishes no numbers and its pinned deps (diffrax/jaxopt/...) are
not installed here (BASELINE.md), so the stand-in baseline is measured at
bench time with identical numerics on this host's CPU.

Prints exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Workload: Lotka-Volterra estimation kernel (tN=20, h=0.01 -> 2000 filter
# steps per NLL eval; reference config scale: configs/params/lotkavolterra2).
NUM_STEPS = 2000
H = 0.01
BATCH = 8192  # restarts per batched eval on TPU
TPU_REPS = 5
CPU_REPS = 3


def _build(dtype_str, batch):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ode_uncertainty_tpu import models, solvers
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
    from ode_uncertainty_tpu.ops import const_diag

    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    m = models.lotka_volterra()
    sol = solvers.rkf45(step_size=H)
    x0 = jnp.array([[1.0, 1.0]], dtype)
    gt = solvers.solve(sol, m, 0.0, x0, NUM_STEPS)
    idx = np.arange(10, NUM_STEPS + 1, 10)
    rng = np.random.default_rng(0)
    ys_raw = np.asarray(gt["x"])[idx].reshape(len(idx), -1)
    ys_raw = ys_raw + 0.1 * rng.standard_normal(ys_raw.shape)
    obs = make_obs_model(np.eye(2), np.asarray(gt["t"])[idx], ys_raw, 0.01, 0.0, H, NUM_STEPS, dtype=dtype)
    spec = make_param_spec(
        m.params,
        {k: (0.1, 5.0) for k in m.params},
        {"alpha": True, "beta": True, "gamma": False, "delta": False},
        dtype=dtype,
    )
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(0.0, x0, const_diag(2, 1e-6, dtype), 2)
    nll = make_nll(m, sol, ekf, spec, obs, state0, NUM_STEPS)
    q = jnp.diag(jnp.ones(2, dtype))
    gam = jnp.asarray(0.1, dtype)

    vg = jax.value_and_grad(lambda p: nll(p, q, gam))
    if batch > 1:
        fn = jax.jit(jax.vmap(vg))
        p = spec.sample_norm(jax.random.key(0), batch).astype(dtype)
    else:
        fn = jax.jit(vg)
        p = spec.defaults_norm_opt().astype(dtype) * 0.9

    return fn, p


def _time_evals(fn, p, reps):
    import jax

    jax.block_until_ready(fn(p))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(p)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_tpu():
    import jax

    assert jax.default_backend() != "cpu", f"expected accelerator, got {jax.default_backend()}"
    fn, p = _build("f32", BATCH)
    dt = _time_evals(fn, p, TPU_REPS)
    return NUM_STEPS * BATCH / dt


def measure_cpu_subprocess():
    """Single-chain f64 CPU kernel in a fresh process (the reference's
    execution model), returns steps/sec."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import bench\n"
        f"fn, p = bench._build('f64', 1)\n"
        f"dt = bench._time_evals(fn, p, {CPU_REPS})\n"
        f"print('CPU_STEPS_PER_SEC=' + str({NUM_STEPS} / dt))\n"
    )
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=600
    )
    for line in out.stdout.splitlines():
        if line.startswith("CPU_STEPS_PER_SEC="):
            return float(line.split("=")[1])
    raise RuntimeError(f"CPU baseline failed:\n{out.stdout}\n{out.stderr}")


def main():
    sys.path.insert(0, REPO)
    cpu_sps = measure_cpu_subprocess()
    tpu_sps = measure_tpu()
    print(
        json.dumps(
            {
                "metric": "sqrt_ekf_nll_grad_filter_steps_per_sec_batched",
                "value": round(tpu_sps, 1),
                "unit": "filter_steps/s",
                "vs_baseline": round(tpu_sps / cpu_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
