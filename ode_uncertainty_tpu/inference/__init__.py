"""Inference layer: filter drivers, NLL objectives, on-device tempered
estimation, calibration and metrics."""

from ode_uncertainty_tpu.inference.calibrate import make_calibration
from ode_uncertainty_tpu.inference.estimate import (
    EstimationResult,
    make_nll_landscape,
    make_tempered_estimator,
)
from ode_uncertainty_tpu.inference.filter_run import (
    make_dense_run,
    make_ekf_run,
    make_ekf_run_static,
    make_gmm_run,
    make_pf_run,
)
from ode_uncertainty_tpu.inference.lbfgs import LBFGSResult, lbfgs_box
from ode_uncertainty_tpu.inference.nll import make_baseline_nll, make_nll
from ode_uncertainty_tpu.inference.observations import (
    ObsModel,
    empty_obs_model,
    make_obs_model,
)
from ode_uncertainty_tpu.inference.params import ParamSpec, make_param_spec
from ode_uncertainty_tpu.inference.schedules import (
    SCHEDULE_REGISTRY,
    CosineAnnealingSchedule,
    ExponentialDecaySchedule,
    LinearDecaySchedule,
    NoiseSchedule,
)
from ode_uncertainty_tpu.inference.trmse import make_trmse_evaluator, trmse

__all__ = [
    "make_calibration",
    "EstimationResult",
    "make_nll_landscape",
    "make_tempered_estimator",
    "make_dense_run",
    "make_ekf_run",
    "make_gmm_run",
    "make_ekf_run_static",
    "make_pf_run",
    "LBFGSResult",
    "lbfgs_box",
    "make_baseline_nll",
    "make_nll",
    "ObsModel",
    "empty_obs_model",
    "make_obs_model",
    "ParamSpec",
    "make_param_spec",
    "SCHEDULE_REGISTRY",
    "CosineAnnealingSchedule",
    "ExponentialDecaySchedule",
    "LinearDecaySchedule",
    "NoiseSchedule",
    "make_trmse_evaluator",
    "trmse",
]
