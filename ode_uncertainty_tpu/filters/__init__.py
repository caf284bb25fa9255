"""Inference layer: square-root EKF and particle filter."""

from ode_uncertainty_tpu.filters.cov_updates import (
    COV_UPDATE_REGISTRY,
    DiagonalUpdate,
    OuterUpdate,
    StaticDiagonalUpdate,
)
from ode_uncertainty_tpu.filters.particle import ParticleFilter, PFState
from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState, SqrtEKF

FILTER_REGISTRY = {
    "SQRT_EKF": SqrtEKF,
    "ParticleFilter": ParticleFilter,
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
    "FILTER_REGISTRY",
]
