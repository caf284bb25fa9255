"""Experiment registry: the reference's full config surface as code.

The reference ships 94 jsonargparse YAML files across 16 families
(/root/reference/configs/, SURVEY.md §2.7). Here the same experiment
definitions are compact Python tables + family builders; the scripts accept
``--experiment family/name`` (resolved here) in addition to ``--config
file.yaml``. Use ``python -m configs.experiments --emit DIR`` to materialize
any experiment as a standalone YAML.

Family map (name -> reference directory):
  gt, noise_gt                      -> run_ode_solver
  ekf_trajectory, pf_trajectory     -> run_filter   (ekf/pf_trajectory_conrad_baseline)
  calibration                       -> run_calibration (calibration_conrad_baseline)
  params, params_plus, params_baseline,
  params_temp_{low,high}_{coarse,fine}[ _num ] -> run_parameter_estimation[_baseline]
"""

from __future__ import annotations

import copy
from typing import Dict

RESULTS = "../results"

# --- core system table ------------------------------------------------------
# x0 / horizons / measurement matrices per system (values follow the
# reference's shipped configs; file pointers in the family builders).
_EYE = lambda n: [[1 if i == j else 0 for j in range(n)] for i in range(n)]

SYSTEMS: Dict[str, dict] = {
    "lotkavolterra": dict(
        model=("LotkaVolterra", {}),
        x0=[[1.0, 1.0]],
        t0=0.0,
        tN_gt=80.0,
        tN=20.0,
        n=2,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "lorenz": dict(
        model=("Lorenz", {}),
        x0=[[1.0, 1.0, 1.0]],
        t0=0.0,
        tN_gt=50.0,
        tN=50.0,
        n=3,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Dopri65", 1e-4),
    ),
    "vanderpol": dict(
        model=("VanDerPol", {}),
        x0=[[2.0], [10.0]],
        t0=10.0,
        tN_gt=80.0,
        tN=80.0,
        n=2,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Dopri65", 1e-4),
    ),
    "lcao": dict(
        model=("LCAO", {}),
        x0=[[1.0, -2.0], [-1.0, 0.5]],
        t0=0.0,
        tN_gt=80.0,
        tN=80.0,
        n=4,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Dopri65", 1e-4),
    ),
    "rlc": dict(
        # reference configs/gt/rlc.yaml:6-11 (explicit non-default R/L/C)
        model=("RLCCircuit", {"resistance": 100.0, "inductance": 250.0, "capacitance": 3.5e-05}),
        x0=[[10.0], [0.0]],
        t0=0.0,
        tN_gt=10.0,
        tN=10.0,
        n=2,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Dopri65", 1e-4),
    ),
    "pendulum": dict(
        model=("Pendulum", {}),
        x0=[[0.785398], [0.0]],
        t0=0.0,
        tN_gt=10.0,
        tN=10.0,
        n=2,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "hodgkinhuxley_full": dict(
        model=("HodgkinHuxley", {"variant": "full"}),
        x0=[[-70.0]],
        t0=0.0,
        tN_gt=100.0,
        tN=100.0,
        n=8,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "hodgkinhuxley_r1": dict(
        model=("HodgkinHuxley", {"variant": "reduced-1"}),
        x0=[[-70.0]],
        t0=0.0,
        tN_gt=100.0,
        tN=100.0,
        n=7,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "hodgkinhuxley_r4": dict(
        model=("HodgkinHuxley", {"variant": "reduced-4"}),
        x0=[[-70.0]],
        t0=0.0,
        tN_gt=100.0,
        tN=100.0,
        n=4,
        gt_solver=("Dopri65", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "hodgkinhuxley_c2_r1": dict(
        model=(
            "MultiCompartmentHodgkinHuxley",
            # Heterogeneous per-compartment ground truth, matching the
            # reference exactly (configs/noise_gt/hodgkinhuxley_c2_r1.yaml:
            # 12-27 == configs/params/hodgkinhuxley6_c2_r1.yaml init_args).
            {
                "variant": "reduced-1",
                "num_compartments": 2,
                "coupling_coeffs": [1.0],
                "C": 1.0,
                "A": [4.15e-5, 4.15e-5],
                "g_Na": [25.0, 20.0],
                "E_Na": [53.0, 53.0],
                "g_K": [7.0, 10.0],
                "E_K": [-107.0, -107.0],
                "g_leak": [0.09, 0.11],
                "E_leak": [-70.0, -70.0],
                "V_T": [-70.0, -50.0],
                "g_M": [0.01, 0.1],
                "tau_max": [4e3, 4e3],
                "g_L": [0.1, 0.01],
                "E_Ca": [120.0, 120.0],
                "g_T": [0.0, 0.0],
                "V_x": [2.0, 2.0],
            },
        ),
        x0=[[-70.0, -70.0]],
        t0=0.0,
        tN_gt=100.0,
        tN=100.0,
        n=14,
        gt_solver=("Kvaerno3", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
    "hodgkinhuxley_c2_r4": dict(
        model=(
            "MultiCompartmentHodgkinHuxley",
            # reference configs/params/hodgkinhuxley2_c2_r4.yaml:17-36
            {
                "variant": "reduced-4",
                "num_compartments": 2,
                "coupling_coeffs": [1.0],
                "C": 1.0,
                "A": [4.15e-5, 4.15e-5],
                "g_Na": [25.0, 20.0],
                "E_Na": [53.0, 53.0],
                "g_K": [7.0, 10.0],
                "E_K": [-107.0, -107.0],
                "g_leak": [0.09, 0.11],
                "E_leak": [-70.0, -70.0],
                "V_T": [-60.0, -60.0],
                "g_M": [0.01, 0.01],
                "tau_max": [4e3, 4e3],
                "g_L": [0.01, 0.01],
                "E_Ca": [120.0, 120.0],
                "g_T": [0.0, 0.0],
                "V_x": [2.0, 2.0],
            },
        ),
        x0=[[-70.0, -70.0]],
        t0=0.0,
        tN_gt=100.0,
        tN=100.0,
        n=8,
        gt_solver=("Kvaerno3", 1e-4),
        noise_gt_solver=("Kvaerno3", 1e-4),
    ),
}

# HH parameter box constraints shared by every HH estimation problem.
HH_RANGES = {
    "C": [0.4, 3.0],
    "A": [1.9e-05, 3.02e-04],
    "g_Na": [0.5, 80.0],
    "E_Na": [50.0, 100.0],
    "g_K": [1e-4, 15.0],
    "E_K": [-110.0, -70.0],
    "g_leak": [1e-4, 0.6],
    "E_leak": [-100.0, -35.0],
    "V_T": [-90.0, -40.0],
    "g_M": [1e-4, 0.6],
    "tau_max": [50.0, 5000.0],
    "g_L": [-1e-4, 0.6],
    "E_Ca": [100.0, 150.0],
    "g_T": [-1e-4, 0.6],
    "V_x": [0.0, 4.0],
}
LV_RANGES = {k: [0.001, 5.0] for k in ("alpha", "beta", "gamma", "delta")}


def _model_node(sys_cfg):
    name, kwargs = sys_cfg["model"]
    return {"class_path": f"ode_uncertainty_tpu.models.{name}", "init_args": dict(kwargs)}


def _solver_node(name, h):
    return {"class_path": f"ode_uncertainty_tpu.solvers.{name}", "init_args": {"step_size": h}}


def _filter_node(kind, disable_cov_update=True, num_particles=100):
    if kind == "ekf":
        return {
            "class_path": "ode_uncertainty_tpu.filters.SQRT_EKF",
            "init_args": {
                "cov_update_fn_builder": {
                    "class_path": "ode_uncertainty_tpu.filters.DiagonalCovarianceUpdate",
                    "init_args": {"scale": 1.0},
                },
                "disable_cov_update": disable_cov_update,
            },
        }
    return {
        "class_path": "ode_uncertainty_tpu.filters.ParticleFilter",
        "init_args": {
            "num_particles": num_particles,
            "cov_update_fn_builder": {
                "class_path": "ode_uncertainty_tpu.filters.DiagonalCovarianceUpdate",
                "init_args": {"scale": 1.0},
            },
        },
    }


def _schedule_node(init_log=-2.0, rate=3.0):
    return {
        "class_path": "ode_uncertainty_tpu.inference.LinearDecaySchedule",
        "init_args": {"init_noise_log": init_log, "decay_rate": rate},
    }


# --- family builders --------------------------------------------------------
# Single-compartment HH systems where the reference's gt/ configs zero the
# T-current conductance (configs/gt/hodgkinhuxley_{full,r1,r4}.yaml set
# g_T: 0.0, while noise_gt/hodgkinhuxley_full.yaml and the full estimation
# problems keep the 0.01 default). g_T only enters the `full` RHS (the
# reduced variants have I_T = 0), so this is behavioral for gt/full only —
# reproduced exactly regardless.
_HH_SINGLE = ("hodgkinhuxley_full", "hodgkinhuxley_r1", "hodgkinhuxley_r4")


def gt(system: str) -> dict:
    s = SYSTEMS[system]
    name, h = s["gt_solver"]
    cfg = {
        "output": f"{RESULTS}/gt/{system}.h5",
        "solver_builder": _solver_node(name, h),
        "ode_builder": _model_node(s),
        "x0": str(s["x0"]),
        "t0": s["t0"],
        "tN": s["tN_gt"],
        "noise_var": 0.0,
        "save_interval": 100 if "hodgkin" in system else 10,
        "seed": 7,
    }
    if system in _HH_SINGLE:
        cfg["ode_builder"]["init_args"]["g_T"] = 0.0
    return cfg


def noise_gt(system: str) -> dict:
    s = SYSTEMS[system]
    name, h = s["noise_gt_solver"]
    cfg = gt(system)
    cfg.update(
        output=f"{RESULTS}/noise_gt/{system}.h5",
        solver_builder=_solver_node(name, h),
        tN=s["tN"],
        noise_var=0.1,
        save_interval=100,
    )
    if system == "hodgkinhuxley_full":
        # the reference's noise_gt/hodgkinhuxley_full.yaml keeps g_T: 0.01
        # (unlike its gt/ counterpart)
        cfg["ode_builder"]["init_args"]["g_T"] = 0.01
    return cfg


_TRAJECTORY_SYSTEMS = ("lotkavolterra", "lorenz", "vanderpol", "lcao")


def ekf_trajectory(system: str, solver: str = "rkf45") -> dict:
    s = SYSTEMS[system]
    sol = {"rkf45": "RKF45", "dopri65": "Dopri65"}[solver]
    return {
        "output": f"{RESULTS}/ekf_trajectory/{solver}/{system}.h5",
        "filter_builder": _filter_node("ekf", disable_cov_update=False),
        "solver_builder": _solver_node(sol, 0.01),
        "ode_builder": _model_node(s),
        "x0": str(s["x0"]),
        "t0": s["t0"],
        "tN": s["tN"],
        "y_path": None,  # prediction only
        "measurement_matrix": str(_EYE(s["n"])),
        "obs_noise_var": 0.0,
        "save_interval": 1,
    }


def pf_trajectory(system: str, solver: str = "rkf45") -> dict:
    cfg = ekf_trajectory(system, solver)
    cfg["output"] = f"{RESULTS}/pf_trajectory/{solver}/{system}.h5"
    cfg["filter_builder"] = _filter_node("pf", num_particles=100)
    return cfg


def calibration(system: str, solver: str = "rkf45") -> dict:
    cfg = ekf_trajectory(system, solver)
    cfg.update(
        output=f"{RESULTS}/calibration/{solver}/{system}.h5",
        y_path=f"{RESULTS}/gt/{system}.h5",
        min_noise_log=-16.0,
        max_noise_log=0.0,
        num_noise_levels=500,
    )
    return cfg


# --- estimation problems ----------------------------------------------------
def _estimation_base(system, solver_name, h, obs_rows, ranges, optimized, evals, **kw):
    s = SYSTEMS[system]
    cfg = {
        "output": f"{RESULTS}/params/{kw.get('tag', system)}.h5",
        "filter_builder": _filter_node("ekf", disable_cov_update=kw.get("disable_cov_update", True)),
        "solver_builder": _solver_node(solver_name, h),
        "ode_builder": _model_node(s),
        "x0": str(s["x0"]),
        "P0": None,
        "t0": s["t0"],
        "tN": s["tN"],
        "y_path": f"{RESULTS}/noise_gt/{kw.get('obs', system)}.h5",
        "measurement_matrix": str(obs_rows),
        "params_range": ranges,
        "params_optimized": optimized,
        "num_tempering_stages": kw.get("stages", 4),
        "final_gamma_zero": True,
        # both flags are implemented (inference/nll.py) but, as in every
        # shipped reference config, disabled
        "initial_state_parametrized": False,
        "parameter_sensitivity": False,
        "obs_noise_var": 0.1,
        "gamma_noise_schedule": _schedule_node(kw.get("init_log", -2.0), kw.get("decay", 3.0)),
        "gamma_noise_weights": str(kw.get("weights", [1] * s["n"])),
        "lbfgs_maxiter": kw.get("maxiter", 200),
        "num_random_runs": kw.get("runs", 100),
        "num_param_evals": evals,
        "seed": kw.get("seed", 7),
    }
    return cfg


def _obs_row(n, idx=0):
    return [[1 if j == idx else 0 for j in range(n)]]


def _hh_problem(tag, system, optimized_names, seed, maxiter=200, evals_override=None, obs=None):
    s = SYSTEMS[system]
    opt = {k: (k in optimized_names) for k in HH_RANGES}
    evals = {k: 1 for k in HH_RANGES}
    # evaluate-grid resolution: C:100 for every HH problem except the two
    # reduced-4 conductance problems (reference params/hodgkinhuxley1_r4.yaml
    # g_Na:100, params/hodgkinhuxley2_r4.yaml g_Na:50+g_K:50)
    evals.update(evals_override or {"C": 100})
    rows = _obs_row(s["n"])
    if "c2" in system:  # observe V of both compartments
        d = s["n"] // 2
        rows = [_obs_row(s["n"])[0], _obs_row(s["n"], d)[0]]
        evals = {"coupling_coeffs": 1, **evals}
    ranges = dict(HH_RANGES)
    if "c2" in system:
        # coupling_coeffs is fixed, never optimized (reference
        # configs/params/hodgkinhuxley2_c2_r4.yaml params_optimized block).
        ranges = {"coupling_coeffs": [1.0, 1.0], **ranges}
        opt = {"coupling_coeffs": False, **opt}
    cfg = _estimation_base(
        system,
        "Kvaerno3",
        0.01,
        rows,
        ranges,
        opt,
        evals,
        tag=tag,
        obs=obs or system,
        seed=seed,
        maxiter=maxiter,
    )
    if system in ("hodgkinhuxley_r1", "hodgkinhuxley_r4"):
        # reference reduced-variant estimation configs zero the (inert)
        # T-current default (e.g. configs/params/hodgkinhuxley2_r4.yaml)
        cfg["ode_builder"]["init_args"]["g_T"] = 0.0
    return cfg


def params(problem: str) -> dict:
    p = {
        "lotkavolterra2": lambda: _estimation_base(
            "lotkavolterra", "RKF45", 0.01, _obs_row(2), LV_RANGES,
            {"alpha": True, "beta": True, "gamma": False, "delta": False},
            {"alpha": 20, "beta": 20, "gamma": 1, "delta": 1},
            tag="lotkavolterra2", seed=2,
        ),
        "lotkavolterra4": lambda: _estimation_base(
            "lotkavolterra", "RKF45", 0.01, _obs_row(2), LV_RANGES,
            {k: True for k in LV_RANGES},
            {"alpha": 10, "beta": 1, "gamma": 10, "delta": 1},
            tag="lotkavolterra4", seed=4, disable_cov_update=False,
        ),
        "pendulum": lambda: _estimation_base(
            "pendulum", "RKF45", 0.01, _obs_row(2), {"length": [0.1, 10.0]},
            {"length": True}, {"length": 100},
            tag="pendulum", seed=7, disable_cov_update=False,
        ),
        "hodgkinhuxley1_r4": lambda: _hh_problem(
            "hodgkinhuxley1_r4", "hodgkinhuxley_r4", {"g_Na"}, 14,
            evals_override={"g_Na": 100},
        ),
        "hodgkinhuxley2_r4": lambda: _hh_problem(
            "hodgkinhuxley2_r4", "hodgkinhuxley_r4", {"g_Na", "g_K"}, 24,
            evals_override={"g_Na": 50, "g_K": 50},
        ),
        "hodgkinhuxley2_c2_r4": lambda: _hh_problem(
            "hodgkinhuxley2_c2_r4", "hodgkinhuxley_c2_r4", {"g_Na", "g_K"}, 224
        ),
        "hodgkinhuxley3_c2_r4": lambda: _hh_problem(
            "hodgkinhuxley3_c2_r4", "hodgkinhuxley_c2_r4", {"g_Na", "g_K", "g_leak"}, 324
        ),
        "hodgkinhuxley6_r1": lambda: _hh_problem(
            "hodgkinhuxley6_r1", "hodgkinhuxley_r1",
            {"g_Na", "g_K", "g_leak", "V_T", "g_M", "g_L"}, 61, maxiter=400,
        ),
        "hodgkinhuxley6_c2_r1": lambda: _hh_problem(
            "hodgkinhuxley6_c2_r1", "hodgkinhuxley_c2_r1",
            {"g_Na", "g_K", "g_leak", "V_T", "g_M", "g_L"}, 621, maxiter=400,
        ),
        "hodgkinhuxley7_full": lambda: _hh_problem(
            "hodgkinhuxley7_full", "hodgkinhuxley_full",
            {"g_Na", "g_K", "g_leak", "V_T", "g_M", "g_L", "g_T"}, 7, maxiter=400,
        ),
        "hodgkinhuxley9_r1": lambda: _hh_problem(
            "hodgkinhuxley9_r1", "hodgkinhuxley_r1",
            {"g_Na", "E_Na", "g_K", "E_K", "g_leak", "E_leak", "V_T", "g_M", "g_L"},
            91, maxiter=400,
        ),
        "hodgkinhuxley11_full": lambda: _hh_problem(
            "hodgkinhuxley11_full", "hodgkinhuxley_full",
            {"g_Na", "E_Na", "g_K", "E_K", "g_leak", "E_leak", "V_T", "g_M", "g_L", "E_Ca", "g_T"},
            11, maxiter=400,
        ),
    }
    return p[problem]()


# params_plus gamma-noise masks, exactly per reference file (diff of
# configs/params_plus/<p>.yaml vs configs/params/<p>.yaml: only the weights
# vector changes). Note lotkavolterra4 keeps [1, 1] — unmasked.
_PLUS_WEIGHTS = {
    "lotkavolterra2": [1, 0],
    "lotkavolterra4": [1, 1],
    "pendulum": [1, 0],
    "hodgkinhuxley1_r4": [1, 0, 0, 0],
    "hodgkinhuxley2_r4": [1, 0, 0, 0],
    "hodgkinhuxley2_c2_r4": [1, 0, 0, 0, 1, 0, 0, 0],
    "hodgkinhuxley3_c2_r4": [1, 0, 0, 0, 1, 0, 0, 0],
    "hodgkinhuxley6_r1": [1, 1, 1, 1, 0, 0, 0],
    "hodgkinhuxley6_c2_r1": [1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0],
    "hodgkinhuxley9_r1": [1, 1, 1, 1, 0, 0, 0],
    "hodgkinhuxley7_full": [1, 1, 1, 1, 0, 0, 0, 0],
    "hodgkinhuxley11_full": [1, 1, 1, 1, 0, 0, 0, 0],
}


def params_plus(problem: str) -> dict:
    """Same problems with gamma noise masked to a state subset (the
    reference's params_plus family: only the weights vector changes)."""
    cfg = params(problem)
    cfg["gamma_noise_weights"] = str(_PLUS_WEIGHTS[problem])
    cfg["output"] = cfg["output"].replace("/params/", "/params_plus/")
    return cfg


def params_baseline(problem: str) -> dict:
    cfg = params(problem)
    cfg["output"] = cfg["output"].replace("/params/", "/params_baseline/")
    # the filter-free baseline protocol has no tempering noise, and its
    # evaluate grids are finer on LV (reference params_baseline/*.yaml)
    cfg["gamma_noise_weights"] = None
    if problem == "lotkavolterra2":
        cfg["num_param_evals"] = {"alpha": 50, "beta": 50, "gamma": 1, "delta": 1}
    elif problem == "lotkavolterra4":
        cfg["num_param_evals"] = {"alpha": 100, "beta": 1, "gamma": 1, "delta": 1}
    return cfg


def params_temp(problem: str, level: str, granularity: str, numerical: bool = False) -> dict:
    """Tempering-schedule ablation grid on Lotka-Volterra (reference
    params_temp_{low,high}_{coarse,fine} and *_num_* variants)."""
    cfg = params(problem)
    init_log = {"low": -2.0, "high": 1.0}[level]
    decay = {"coarse": 3.0, "fine": 1.0}[granularity]
    stages = {("low", "coarse"): 4, ("low", "fine"): 8, ("high", "coarse"): 5, ("high", "fine"): 11}[
        (level, granularity)
    ]
    cfg["gamma_noise_schedule"] = _schedule_node(init_log, decay)
    cfg["num_tempering_stages"] = stages
    cfg["filter_builder"]["init_args"]["disable_cov_update"] = not numerical
    if problem == "lotkavolterra2":
        # the ablation families grid LV2 finer than params/ (reference
        # params_temp_*/lotkavolterra2.yaml num_param_evals 50/50)
        cfg["num_param_evals"] = {"alpha": 50, "beta": 50, "gamma": 1, "delta": 1}
    fam = f"params_temp_{'num_' if numerical else ''}{level}_{granularity}"
    cfg["output"] = cfg["output"].replace("/params/", f"/{fam}/")
    return cfg


# --- registry ----------------------------------------------------------------
def build(experiment: str) -> dict:
    """Resolves 'family/name' to a config dict."""
    family, _, name = experiment.partition("/")
    if family == "gt":
        return gt(name)
    if family == "noise_gt":
        return noise_gt(name)
    if family in ("ekf_trajectory", "pf_trajectory", "calibration"):
        solver, _, system = name.partition("/")
        if not system:
            solver, system = "rkf45", solver
        fn = {"ekf_trajectory": ekf_trajectory, "pf_trajectory": pf_trajectory, "calibration": calibration}[family]
        return fn(system, solver)
    if family == "params":
        return params(name)
    if family == "params_plus":
        return params_plus(name)
    if family == "params_baseline":
        return params_baseline(name)
    if family.startswith("params_temp"):
        parts = family.split("_")  # params temp [num] level gran
        numerical = "num" in parts
        level, gran = parts[-2], parts[-1]
        return params_temp(name, level, gran, numerical)
    raise KeyError(f"Unknown experiment {experiment!r}")


def all_experiments():
    out = []
    out += [f"gt/{s}" for s in SYSTEMS if s not in ("pendulum", "hodgkinhuxley_c2_r1", "hodgkinhuxley_c2_r4")]
    out += [f"noise_gt/{s}" for s in SYSTEMS if s != "rlc"]
    for fam in ("ekf_trajectory", "pf_trajectory", "calibration"):
        out += [f"{fam}/{sol}/{s}" for sol in ("rkf45", "dopri65") for s in _TRAJECTORY_SYSTEMS]
    probs = [
        "lotkavolterra2", "lotkavolterra4", "pendulum",
        "hodgkinhuxley1_r4", "hodgkinhuxley2_r4", "hodgkinhuxley2_c2_r4",
        "hodgkinhuxley3_c2_r4", "hodgkinhuxley6_r1", "hodgkinhuxley6_c2_r1",
        "hodgkinhuxley7_full", "hodgkinhuxley9_r1", "hodgkinhuxley11_full",
    ]
    out += [f"params/{p}" for p in probs]
    out += [f"params_plus/{p}" for p in probs]
    out += [f"params_baseline/{p}" for p in probs]
    for num in ("", "num_"):
        for lvl in ("low", "high"):
            for gran in ("coarse", "fine"):
                out += [f"params_temp_{num}{lvl}_{gran}/lotkavolterra2",
                        f"params_temp_{num}{lvl}_{gran}/lotkavolterra4"]
    return out


if __name__ == "__main__":
    import argparse
    import pathlib

    import yaml

    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", help="directory to write YAMLs into")
    ap.add_argument("--list", action="store_true")
    ns = ap.parse_args()
    if ns.list or not ns.emit:
        for e in all_experiments():
            print(e)
    if ns.emit:
        for e in all_experiments():
            cfg = build(e)
            p = pathlib.Path(ns.emit) / (e + ".yaml")
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(yaml.safe_dump(cfg, sort_keys=False))
        print(f"emitted {len(all_experiments())} configs -> {ns.emit}")
