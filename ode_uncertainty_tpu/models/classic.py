"""Classic ODE test systems.

Parity targets (reference files, re-derived not copied):
  exponential       /root/reference/src/ode/exponential.py
  logistic          /root/reference/src/ode/logistic.py   (+ analytic solution)
  lotka_volterra    /root/reference/src/ode/lotka_volterra.py
  lorenz            /root/reference/src/ode/lorenz.py
  pendulum          /root/reference/src/ode/pendulum.py
  van_der_pol       /root/reference/src/ode/van_der_pol.py
  lcao              /root/reference/src/ode/lcao.py
  rlc_circuit       /root/reference/src/ode/rlc_circuit.py (+ analytic solution)

State convention: y has shape [N, D]; for second-order systems row 0 is the
position and row 1 the velocity, and the RHS returns [velocity, acceleration].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.models.base import ODEModel, Params, as_params


def exponential(growth_factor: float = 1.0) -> ODEModel:
    """dy/dt = a * y  (N=1, D=1) with closed-form solution."""

    def rhs(t, y, params):
        del t
        return params["growth_factor"] * y

    def solution(ts, x0, params):
        return x0[0][None, :] * jnp.exp(params["growth_factor"] * ts)[:, None]

    return ODEModel(
        "exponential", 1, 1, rhs, as_params(growth_factor=growth_factor), solution=solution
    )


def logistic(growth_rate: float = 1.0, carrying_capacity: float = 1.0) -> ODEModel:
    """Logistic growth (N=1, D=1) with closed-form solution."""

    def rhs(t, y, params):
        del t
        return params["growth_rate"] * y * (1.0 - y / params["carrying_capacity"])

    def solution(ts, x0, params):
        # x(t) = K / (1 + (K - x0)/x0 * exp(-r t)), broadcast over time.
        k = params["carrying_capacity"]
        r = params["growth_rate"]
        y0 = x0[0]  # [D]
        return k / (1.0 + ((k - y0) / y0)[None, :] * jnp.exp(-r * ts)[:, None])

    return ODEModel(
        "logistic",
        1,
        1,
        rhs,
        as_params(growth_rate=growth_rate, carrying_capacity=carrying_capacity),
        solution=solution,
    )


def lotka_volterra(
    alpha: float = 1.5, beta: float = 1.0, gamma: float = 3.0, delta: float = 1.0
) -> ODEModel:
    """Predator-prey system (N=1, D=2)."""

    def rhs(t, y, params):
        del t
        prey, pred = y[:, 0], y[:, 1]
        d_prey = params["alpha"] * prey - params["beta"] * prey * pred
        d_pred = params["delta"] * prey * pred - params["gamma"] * pred
        return jnp.stack([d_prey, d_pred], axis=-1)

    return ODEModel(
        "lotka_volterra",
        1,
        2,
        rhs,
        as_params(alpha=alpha, beta=beta, gamma=gamma, delta=delta),
    )


def lorenz(sigma: float = 10.0, beta: float = 8.0 / 3.0, rho: float = 28.0) -> ODEModel:
    """Chaotic Lorenz system (N=1, D=3)."""

    def rhs(t, y, params):
        del t
        a, b, c = y[:, 0], y[:, 1], y[:, 2]
        return jnp.stack(
            [
                params["sigma"] * (b - a),
                a * (params["rho"] - c) - b,
                a * b - params["beta"] * c,
            ],
            axis=-1,
        )

    return ODEModel("lorenz", 1, 3, rhs, as_params(sigma=sigma, beta=beta, rho=rho))


def pendulum(length: float = 3.0) -> ODEModel:
    """Nonlinear pendulum (N=2, D=1)."""

    def rhs(t, y, params):
        del t
        pos, vel = y[0], y[1]
        acc = -9.81 / params["length"] * jnp.sin(pos)
        return jnp.stack([vel, acc], axis=-2)

    return ODEModel("pendulum", 2, 1, rhs, as_params(length=length))


def van_der_pol(damping: float = 5.0) -> ODEModel:
    """Van der Pol oscillator (N=2, D=1), stiff-ish for large damping."""

    def rhs(t, y, params):
        del t
        pos, vel = y[0], y[1]
        acc = params["damping"] * (1.0 - pos**2) * vel - pos
        return jnp.stack([vel, acc], axis=-2)

    return ODEModel("van_der_pol", 2, 1, rhs, as_params(damping=damping))


def lcao(
    lin_coeff: float = 1.0, cubic_coeff: float = 2.0, coupling_coeff: float = 0.5
) -> ODEModel:
    """Linearly coupled anharmonic oscillators (N=2, D=2).

    Two cubic oscillators coupled by exchanging positions (flip along D).
    """

    def rhs(t, y, params):
        del t
        pos, vel = y[0], y[1]
        acc = (
            -params["lin_coeff"] * pos
            - params["cubic_coeff"] * pos**3
            - params["coupling_coeff"] * jnp.flip(pos, axis=-1)
        )
        return jnp.stack([vel, acc], axis=-2)

    return ODEModel(
        "lcao",
        2,
        2,
        rhs,
        as_params(lin_coeff=lin_coeff, cubic_coeff=cubic_coeff, coupling_coeff=coupling_coeff),
    )


def rlc_circuit(
    resistance: float = 1.0, inductance: float = 1.0, capacitance: float = 1.0
) -> ODEModel:
    """Series RLC circuit (N=2, D=1) with closed-form solutions in all
    damping regimes (test oracle)."""

    def rhs(t, y, params):
        del t
        q, dq = y[0], y[1]
        d2q = (
            -params["resistance"] / params["inductance"] * dq
            - q / (params["inductance"] * params["capacitance"])
        )
        return jnp.stack([dq, d2q], axis=-2)

    # Damping regime is decided at model-construction time from concrete
    # floats (the analytic solution is a test oracle, not traced code).
    delta = 0.5 * resistance / inductance
    omega0_sq = 1.0 / (inductance * capacitance)

    def solution(ts, x0, params):
        del params
        q0 = x0[0]  # [D]
        tt = ts[:, None]
        if omega0_sq - delta**2 > 1e-6:  # underdamped
            om = (omega0_sq - delta**2) ** 0.5
            return q0[None, :] * (
                (jnp.cos(om * tt) + (delta / om) * jnp.sin(om * tt)) * jnp.exp(-delta * tt)
            )
        elif delta**2 - omega0_sq > 1e-6:  # overdamped
            lam = (delta**2 - omega0_sq) ** 0.5
            return (
                0.5
                * q0[None, :]
                / lam
                * (
                    (lam + delta) * jnp.exp(lam * tt)
                    + (lam - delta) * jnp.exp(-lam * tt)
                )
                * jnp.exp(-delta * tt)
            )
        else:  # critically damped
            return q0[None, :] * (1.0 + delta * tt) * jnp.exp(-delta * tt)

    return ODEModel(
        "rlc_circuit",
        2,
        1,
        rhs,
        as_params(resistance=resistance, inductance=inductance, capacitance=capacitance),
        solution=solution,
    )
