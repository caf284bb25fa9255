"""ODE solver layer: embedded explicit RK + implicit ESDIRK steppers."""

from ode_uncertainty_tpu.solvers.erk import ERK, StepFn, bs32, dopri65, heun_euler, rkf45
from ode_uncertainty_tpu.solvers.sdirk import Kvaerno3, kvaerno3
from ode_uncertainty_tpu.solvers.solve import make_solve_fn, solve
from ode_uncertainty_tpu.solvers.tableaus import (
    BS32,
    DOPRI65,
    HEUN_EULER,
    RKF45,
    TABLEAUS,
    ButcherTableau,
)

# Registry for config-driven instantiation (mirrors reference class names,
# /root/reference/src/solvers/__init__.py).
SOLVER_REGISTRY = {
    "HeunEuler": heun_euler,
    "BS32": bs32,
    "RKF45": rkf45,
    "Dopri65": dopri65,
    "Kvaerno3": kvaerno3,
}

__all__ = [
    "ERK",
    "StepFn",
    "ButcherTableau",
    "Kvaerno3",
    "heun_euler",
    "bs32",
    "rkf45",
    "dopri65",
    "kvaerno3",
    "make_solve_fn",
    "solve",
    "SOLVER_REGISTRY",
    "TABLEAUS",
    "HEUN_EULER",
    "BS32",
    "RKF45",
    "DOPRI65",
]
