"""Numerical kernel library (square-root linear algebra, linearization,
observation alignment, normalization)."""

from ode_uncertainty_tpu.ops.align import build_observation_maps, isin_tolerance, sync_times
from ode_uncertainty_tpu.ops.chol_update import chol_update
from ode_uncertainty_tpu.ops.linearize import pull_sqrt, push_sqrt, value_and_jacfwd
from ode_uncertainty_tpu.ops.normalize import clip01, inv_normalize, normalize
from ode_uncertainty_tpu.ops.sqrt_linalg import (
    cho_solve_sqrt,
    const_diag,
    jeffrey_gaussian_sqrt,
    kl_gaussian_sqrt,
    nll_gaussian_sqrt,
    pdf_gaussian_sqrt,
    sqrt_sum,
    tria,
)

__all__ = [
    "build_observation_maps",
    "isin_tolerance",
    "sync_times",
    "chol_update",
    "pull_sqrt",
    "push_sqrt",
    "value_and_jacfwd",
    "clip01",
    "inv_normalize",
    "normalize",
    "cho_solve_sqrt",
    "const_diag",
    "jeffrey_gaussian_sqrt",
    "kl_gaussian_sqrt",
    "nll_gaussian_sqrt",
    "pdf_gaussian_sqrt",
    "sqrt_sum",
    "tria",
]
