"""Explicit embedded Runge-Kutta stepper.

TPU-first design vs reference (/root/reference/src/solvers/rksolver.py):
the reference runs the stage loop as a sequential ``lax.scan`` over a
``[N, D, S]`` node buffer with ``ks @ A[idx]`` matvecs. Stage counts are tiny
and static (2-8), so here stages are **unrolled in Python** with zero tableau
entries skipped at trace time — XLA sees a flat chain of fused multiply-adds
per stage and can fuse the entire step into a handful of VPU kernels with no
scan carry traffic or wasted zero-multiplies. This also makes the step a
plain differentiable function of ``(t, x, params)``, which is what the
square-root EKF linearizes.

Contract: ``step(rhs, params, t, x) -> (x_next, eps)`` where ``eps`` is the
embedded local-error magnitude ``|x_hat - x_next|`` that drives the
probabilistic covariance update.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.models.base import ODEFn, Params
from ode_uncertainty_tpu.solvers import tableaus
from ode_uncertainty_tpu.solvers.tableaus import ButcherTableau

# step :: (rhs, params, t [], x [N, D]) -> (x_next [N, D], eps [N, D])
StepFn = Callable[[ODEFn, Params, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]


def _weighted_sum(terms, weights):
    """sum_i w_i * terms_i, skipping structural zeros at trace time."""
    acc = None
    for w, k in zip(weights, terms):
        if w == 0.0:
            continue
        contrib = w * k
        acc = contrib if acc is None else acc + contrib
    return acc


@dataclasses.dataclass(frozen=True)
class ERK:
    """Explicit embedded RK solver with fixed step size ``h``."""

    tableau: ButcherTableau
    h: float = 0.1

    @property
    def name(self) -> str:
        return self.tableau.name

    def step(self, rhs: ODEFn, params: Params, t: jax.Array, x: jax.Array):
        """One fixed step: returns (x_next, eps)."""
        tab = self.tableau
        h = jnp.asarray(self.h, dtype=x.dtype)
        ks = []
        for i in range(tab.num_stages):
            if i == 0:
                xi = x
            else:
                incr = _weighted_sum(ks, tab.a[i][:i])
                xi = x if incr is None else x + h * incr
            ks.append(rhs(t + tab.c[i] * h, xi, params))
        x_next = x + h * _weighted_sum(ks, tab.b_sol)
        err = _weighted_sum(ks, tuple(e - s for e, s in zip(tab.b_err, tab.b_sol)))
        eps = jnp.abs(h * err)
        return x_next, eps


def heun_euler(step_size: float = 0.1) -> ERK:
    return ERK(tableaus.HEUN_EULER, step_size)


def bs32(step_size: float = 0.1) -> ERK:
    return ERK(tableaus.BS32, step_size)


def rkf45(step_size: float = 0.1) -> ERK:
    return ERK(tableaus.RKF45, step_size)


def dopri65(step_size: float = 0.1) -> ERK:
    return ERK(tableaus.DOPRI65, step_size)
