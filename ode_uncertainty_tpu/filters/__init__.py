"""Inference layer: square-root EKF and particle filter."""

from ode_uncertainty_tpu.filters.cov_updates import (
    COV_UPDATE_REGISTRY,
    DiagonalUpdate,
    OuterUpdate,
    StaticDiagonalUpdate,
)
from ode_uncertainty_tpu.filters.ekf import DenseEKF, DenseEKFState
from ode_uncertainty_tpu.filters.gmm_ekf import GMMSqrtEKF, GMMState
from ode_uncertainty_tpu.filters.particle import ParticleFilter, PFState
from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState, SqrtEKF
from ode_uncertainty_tpu.filters.ukf import UKF, SqrtUKF

FILTER_REGISTRY = {
    "SQRT_EKF": SqrtEKF,
    "ParticleFilter": ParticleFilter,
    # extension filters (reference's deprecated algorithm set, §2.5)
    "EKF": DenseEKF,
    "UKF": UKF,
    "UKF_SQRT": SqrtUKF,
    "GMM_EKF": GMMSqrtEKF,
}

__all__ = [
    "COV_UPDATE_REGISTRY",
    "DiagonalUpdate",
    "OuterUpdate",
    "StaticDiagonalUpdate",
    "ParticleFilter",
    "PFState",
    "EKFState",
    "SqrtEKF",
    "DenseEKF",
    "DenseEKFState",
    "UKF",
    "SqrtUKF",
    "GMMSqrtEKF",
    "GMMState",
    "FILTER_REGISTRY",
]
