"""ESDIRK implicit stepper (Kvaerno 3(2)) with embedded error estimate.

Replaces the reference's diffrax dependency (/root/reference/src/solvers/
diffrax_solver.py: wraps diffrax ``Kvaerno3`` + Newton for stiff
Hodgkin-Huxley runs). Two deliberate upgrades:

  * **real local-error output**: the reference zeroes ``eps`` for implicit
    steps (diffrax_solver.py:130), silently disabling local-error UQ for the
    stiff configs. Here the embedded 2nd-order solution provides
    ``eps = |x_hat - x_next|`` exactly as for the explicit pairs.
  * **batched fixed-iteration simplified Newton**: one Jacobian per step
    (forward-mode, tiny ND x ND), one LU factorization of ``I - h*gamma*J``
    reused across stages and iterations. Fixed iteration counts keep the
    program static-shaped, fully ``vmap``-able across 1k-wide batches, and
    differentiable by plain unrolling (no implicit-function custom VJP
    needed at these sizes).

Tableau: Kvaerno (2004) ESDIRK 3(2), stiffly accurate, same method family
the reference selects by name ("Kvaerno3").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from ode_uncertainty_tpu.models.base import ODEFn, Params

# Kvaerno 3(2) coefficients.
_GAMMA = 0.4358665215084590
_A = (
    (0.0, 0.0, 0.0, 0.0),
    (_GAMMA, _GAMMA, 0.0, 0.0),
    (0.490563388419108, 0.073570090080892, _GAMMA, 0.0),
    (0.308809969973036, 1.490563388254106, -1.235239879727145, _GAMMA),
)
_B_SOL = _A[3]  # stiffly accurate: propagated solution = last stage row
_B_ERR = _A[2] + ()  # embedded 2nd-order solution = 3rd stage row
_C = (0.0, 2.0 * _GAMMA, 1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class Kvaerno3:
    """ESDIRK 3(2) with fixed step size and fixed Newton iteration count."""

    h: float = 0.1
    newton_iters: int = 6

    @property
    def name(self) -> str:
        return "kvaerno3"

    def step(self, rhs: ODEFn, params: Params, t: jax.Array, x: jax.Array):
        shape = x.shape
        n = x.size
        h = jnp.asarray(self.h, dtype=x.dtype)

        def f_flat(ti, z):
            return rhs(ti, z.reshape(shape), params).reshape(n)

        x0 = x.reshape(n)

        # Simplified Newton: one Jacobian + LU at the step's base point.
        jac = jax.jacfwd(lambda z: f_flat(t, z))(x0)  # [n, n]
        m = jnp.eye(n, dtype=x.dtype) - (h * _GAMMA) * jac
        m_lu = lu_factor(m)

        newton_iters = self.newton_iters

        def stage_solve(t_i, known, z0):
            """Solves z = known + h*gamma*f(t_i, z).

            Forward: fixed-iteration simplified Newton reusing the one LU.
            Derivatives: implicit-function theorem via ``lax.custom_root`` —
            one linear solve per tangent instead of differentiating through
            the Newton iterations (compile size and grad cost of the
            EKF/NLL paths drop by the iteration count).
            """

            def residual(z):
                return z - known - (h * _GAMMA) * f_flat(t_i, z)

            def solve(_, z):
                def newton_iter(_, z):
                    return z - lu_solve(m_lu, residual(z))

                return jax.lax.fori_loop(0, newton_iters, newton_iter, z)

            def tangent_solve(g_lin, y):
                return jnp.linalg.solve(jax.jacfwd(g_lin)(y), y)

            return jax.lax.custom_root(residual, z0, solve, tangent_solve)

        ks = [f_flat(t, x0)]  # stage 1 is explicit (a11 = 0)
        for i in range(1, 4):
            t_i = t + _C[i] * h
            known = x0
            for j in range(i):
                if _A[i][j] != 0.0:
                    known = known + (h * _A[i][j]) * ks[j]

            z = stage_solve(t_i, known, known + (h * _GAMMA) * ks[i - 1])
            ks.append(f_flat(t_i, z))

        x_next = x0
        err = jnp.zeros_like(x0)
        for i in range(4):
            if _B_SOL[i] != 0.0:
                x_next = x_next + (h * _B_SOL[i]) * ks[i]
            d = _B_ERR[i] - _B_SOL[i]
            if d != 0.0:
                err = err + (h * d) * ks[i]

        return x_next.reshape(shape), jnp.abs(err).reshape(shape)


def kvaerno3(step_size: float = 0.1, newton_iters: int = 6) -> Kvaerno3:
    return Kvaerno3(step_size, newton_iters)
