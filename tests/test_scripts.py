"""Config system + CLI script smoke tests (tiny settings, CPU)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"

sys.path.insert(0, str(REPO / "configs"))


def _run(script, *args, timeout=600):
    env = {
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/tmp",
    }
    out = subprocess.run(
        [sys.executable, str(SCRIPTS / script), *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=SCRIPTS,
        timeout=timeout,
    )
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


# ------------------------------------------------------------- config system
def test_experiment_registry_builds_all():
    import experiments

    names = experiments.all_experiments()
    assert len(names) == 94  # parity with the reference's 94 config files
    for name in names:
        cfg = experiments.build(name)
        assert "output" in cfg


def test_instantiate_reference_style_config(tmp_path):
    """A reference-style YAML (src.* class paths, reference arg names)
    resolves against our registries."""
    from ode_uncertainty_tpu.filters import SqrtEKF
    from ode_uncertainty_tpu.models.base import ODEModel
    from ode_uncertainty_tpu.utils.config import load_config

    cfg_text = """
output: /tmp/out.h5
filter_builder:
  class_path: src.filters.SQRT_EKF
  init_args:
    cov_update_fn_builder:
      class_path: src.covariance_update_functions.DiagonalCovarianceUpdate
      init_args: {scale: 1.0}
    disable_cov_update: true
solver_builder:
  class_path: src.solvers.RKF45
  init_args: {step_size: 0.01}
ode_builder:
  class_path: src.ode.LotkaVolterra
  init_args: {alpha: 1.5, beta: 1.0, gamma: 3.0, delta: 1.0}
x0: '[[1.0, 1.0]]'
"""
    p = tmp_path / "ref_style.yaml"
    p.write_text(cfg_text)
    cfg = load_config(str(p))
    assert isinstance(cfg["filter_builder"], SqrtEKF)
    assert cfg["filter_builder"].disable_cov_update is True
    assert isinstance(cfg["ode_builder"], ODEModel)
    assert cfg["solver_builder"].h == 0.01


def test_diffrax_config_maps_to_native_solver():
    from ode_uncertainty_tpu.solvers import Kvaerno3
    from ode_uncertainty_tpu.utils.config import instantiate

    node = {
        "class_path": "src.solvers.DiffraxSolverBuilder",
        "init_args": {"name": "Kvaerno3", "step_size": 0.01},
    }
    solver = instantiate(node)
    assert isinstance(solver, Kvaerno3)
    assert solver.h == 0.01


def test_multicompartment_config_with_string_lists():
    from ode_uncertainty_tpu.utils.config import instantiate

    node = {
        "class_path": "src.ode.MultiCompartmentHodgkinHuxley",
        "init_args": {
            "model": "reduced-4",
            "num_compartments": 2,
            "coupling_coeffs": "[1.0]",
            "g_Na": "[25.0, 20.0]",
        },
    }
    m = instantiate(node)
    assert m.dim == 8
    np.testing.assert_allclose(np.asarray(m.params["g_Na"]), [25.0, 20.0])


def test_c2_experiment_fidelity():
    """The four multi-compartment problems must match the reference YAMLs:
    heterogeneous per-compartment ground-truth parameters and
    coupling_coeffs excluded from optimization (reference
    configs/params/hodgkinhuxley2_c2_r4.yaml:17-36 + params_optimized,
    configs/params/hodgkinhuxley6_c2_r1.yaml:29-32)."""
    import experiments

    from ode_uncertainty_tpu.inference import make_param_spec
    from ode_uncertainty_tpu.utils.config import instantiate

    ref_common = {
        "A": [4.15e-5, 4.15e-5],
        "g_Na": [25.0, 20.0],
        "g_K": [7.0, 10.0],
        "g_leak": [0.09, 0.11],
        "E_K": [-107.0, -107.0],
        "tau_max": [4e3, 4e3],
    }
    ref_by_variant = {
        "r4": {**ref_common, "V_T": [-60.0, -60.0], "g_M": [0.01, 0.01], "g_L": [0.01, 0.01]},
        "r1": {**ref_common, "V_T": [-70.0, -50.0], "g_M": [0.01, 0.1], "g_L": [0.1, 0.01]},
    }
    expected_opt = {
        "hodgkinhuxley2_c2_r4": ("g_K", "g_K", "g_Na", "g_Na"),
        "hodgkinhuxley3_c2_r4": ("g_K", "g_K", "g_Na", "g_Na", "g_leak", "g_leak"),
        "hodgkinhuxley6_c2_r1": (
            "V_T", "V_T", "g_K", "g_K", "g_L", "g_L",
            "g_M", "g_M", "g_Na", "g_Na", "g_leak", "g_leak",
        ),
    }
    for prob, opt_keys in expected_opt.items():
        cfg = {k: instantiate(v) for k, v in experiments.params(prob).items()}
        model = cfg["ode_builder"]
        ref = ref_by_variant["r4" if "r4" in prob else "r1"]
        for k, v in ref.items():
            np.testing.assert_allclose(np.asarray(model.params[k]), v, err_msg=f"{prob}:{k}")
        spec = make_param_spec(model.params, cfg["params_range"], cfg["params_optimized"])
        assert spec.opt_keys == opt_keys, f"{prob}: {spec.opt_keys}"
        assert "coupling_coeffs" not in spec.opt_keys
    # the observation generator must use the same heterogeneous ground truth
    gt_cfg = {k: instantiate(v) for k, v in experiments.noise_gt("hodgkinhuxley_c2_r4").items()}
    np.testing.assert_allclose(np.asarray(gt_cfg["ode_builder"].params["g_Na"]), [25.0, 20.0])


# ------------------------------------------------------------------ pipeline
@pytest.mark.slow
def test_end_to_end_pipeline(tmp_path):
    """gt -> noisy obs -> EKF filter -> estimation -> trmse via the CLIs."""
    gt_path = tmp_path / "gt.h5"
    _run(
        "run_ode_solver.py",
        "--experiment",
        "noise_gt/lotkavolterra",
        "--set",
        f"output={gt_path}",
        "--set",
        "tN=5.0",
        "--set",
        "solver_builder={class_path: RKF45, init_args: {step_size: 0.01}}",
        "--set",
        "save_interval=10",
    )
    assert gt_path.exists()

    est_path = tmp_path / "est.h5"
    out = _run(
        "run_parameter_estimation.py",
        "optimize",
        "--experiment",
        "params/lotkavolterra2",
        "--set",
        f"output={est_path}",
        "--set",
        f"y_path={gt_path}",
        "--set",
        "tN=5.0",
        "--set",
        "measurement_matrix=[[1, 0], [0, 1]]",
        "--set",
        "num_random_runs=4",
        "--set",
        "num_tempering_stages=2",
        "--set",
        "lbfgs_maxiter=25",
    )
    assert "optimize: 4 restarts x 2 stages" in out

    from ode_uncertainty_tpu.utils.io import load_data

    data = load_data(str(est_path))
    assert data["params_optims"].shape == (4, 2, 2)
    # restarts that start in a blow-up region stay at NaN (the reference
    # records degenerate rows for failed restarts too); the best must be real
    assert np.isfinite(data["nll_optims"][:, -1]).any()

    out = _run(
        "compute_trmse.py",
        "--experiment",
        "params/lotkavolterra2",
        "--set",
        f"parameter_estimates_input={est_path}",
        "--set",
        "tN=5.0",
    )
    assert "tRMSE=" in out


@pytest.fixture(scope="module")
def lv_obs_h5(tmp_path_factory):
    """Tiny noisy LV ground truth shared by the calibration/baseline CLIs."""
    gt_path = tmp_path_factory.mktemp("obs") / "gt.h5"
    _run(
        "run_ode_solver.py",
        "--experiment",
        "noise_gt/lotkavolterra",
        "--set",
        f"output={gt_path}",
        "--set",
        "tN=5.0",
        "--set",
        "solver_builder={class_path: RKF45, init_args: {step_size: 0.01}}",
        "--set",
        "save_interval=10",
    )
    return gt_path


@pytest.mark.slow
def test_run_calibration_cli(lv_obs_h5, tmp_path):
    """Conrad static-noise sweep vs local-error NLL (reference
    run_calibration_conrad_baseline_calibration.py:126-158 protocol)."""
    out_path = tmp_path / "calib.h5"
    out = _run(
        "run_calibration.py",
        "--experiment",
        "calibration/rkf45/lotkavolterra",
        "--set",
        f"output={out_path}",
        "--set",
        f"y_path={lv_obs_h5}",
        "--set",
        "tN=5.0",
        "--set",
        "num_noise_levels=8",
    )
    assert "calibration: 8 levels" in out

    from ode_uncertainty_tpu.utils.io import load_data

    data = load_data(str(out_path))
    assert data["noise_levels"].shape == (8,)
    assert data["nll_conrad"].shape == (8,)
    assert np.isfinite(data["nll_ours"]).all()
    # the sweep must actually vary with the noise level
    assert np.ptp(data["nll_conrad"][np.isfinite(data["nll_conrad"])]) > 0.0


@pytest.mark.slow
def test_run_parameter_estimation_baseline_cli(lv_obs_h5, tmp_path):
    """Filter-free trajectory-fitting baseline (reference
    run_parameter_estimation_baseline.py protocol): tempering-free L-BFGS."""
    est_path = tmp_path / "base.h5"
    out = _run(
        "run_parameter_estimation_baseline.py",
        "optimize",
        "--experiment",
        "params_baseline/lotkavolterra2",
        "--set",
        f"output={est_path}",
        "--set",
        f"y_path={lv_obs_h5}",
        "--set",
        "tN=5.0",
        "--set",
        "measurement_matrix=[[1, 0], [0, 1]]",
        "--set",
        "num_random_runs=3",
        "--set",
        "lbfgs_maxiter=20",
    )
    assert "baseline optimize: 3 restarts" in out

    from ode_uncertainty_tpu.utils.io import load_data

    data = load_data(str(est_path))
    assert data["params_optims"].shape[0] == 3
    assert np.isfinite(data["nll_optims"]).any()


# ------------------------------------------------------------------ bench.py
def test_bench_build_smoke():
    """The driver runs bench.py on TPU every round; guard its _build plumbing
    (workload rigs, impl env knobs, sample shapes) with a tiny CPU eval."""
    sys.path.insert(0, str(REPO))
    import jax
    import numpy as np
    import bench

    fn, p, steps = bench._build("lv", "f32", batch=2, steps=20)
    vals, grads = jax.device_get(fn(p))
    assert steps == 20
    assert vals.shape == (2,) and grads.shape == p.shape
    assert np.isfinite(vals).all() and np.isfinite(grads).all()

    # single-chain f64 variant (the CPU-baseline leg)
    fn1, p1, _ = bench._build("lv", "f64", batch=1, steps=20)
    v1, g1 = jax.device_get(fn1(p1))
    assert np.isfinite(v1) and np.isfinite(g1).all()
