"""ODE model layer: pure RHS functions plus static metadata.

Design notes (vs reference /root/reference/src/ode/ode.py:10-53): the
reference uses a mutable class hierarchy (``ODEBuilder``) whose instances are
threaded through builders. Here a model is an immutable host-side descriptor
holding a pure function ``rhs(t, y, params) -> dy/dt`` with ``y`` of shape
``[N, D]`` (ODE order N stacked along axis 0, latent dimension D along axis
1, same state convention as the reference) and a parameter dict of arrays.
Descriptors never cross a ``jit`` boundary; compiled code closes over
``model.rhs`` and receives ``params`` as traced pytrees, so a single
compilation serves every parameter value (required for on-device parameter
estimation).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]
# rhs :: (t [], y [N, D], params) -> dy/dt [N, D]
ODEFn = Callable[[jax.Array, jax.Array, Params], jax.Array]


def _default_initial_value(x0: jax.Array, params: Params) -> jax.Array:
    del params
    return x0


@dataclasses.dataclass(frozen=True)
class ODEModel:
    """Immutable ODE descriptor.

    Attributes:
        name: Human-readable model name.
        n_order: ODE order N (number of stacked derivative rows).
        dim: Latent dimension D.
        rhs: Pure RHS function ``(t, y, params) -> dy/dt``.
        params: Default parameter values (dict of arrays).
        initial_value_fn: Optional map ``(x0, params) -> y0`` for models whose
            initial state depends on parameters (reference:
            src/ode/hodgkin_huxley.py:251-281). Defaults to identity.
        solution: Optional analytic solution ``(ts [T], x0 [N, D], params) ->
            xs [T, D]`` used as a test oracle (reference: src/ode/logistic.py:43-70,
            src/ode/rlc_circuit.py:63-110).
    """

    name: str
    n_order: int
    dim: int
    rhs: ODEFn
    params: Params
    initial_value_fn: Callable[[jax.Array, Params], jax.Array] = _default_initial_value
    solution: Optional[Callable[[jax.Array, jax.Array, Params], jax.Array]] = None

    @property
    def state_shape(self) -> tuple:
        return (self.n_order, self.dim)

    @property
    def state_size(self) -> int:
        return self.n_order * self.dim

    def build_initial_value(self, x0: jax.Array, params: Optional[Params] = None) -> jax.Array:
        """Builds the full initial state from a (possibly partial) x0."""
        p = self.params if params is None else params
        return self.initial_value_fn(jnp.asarray(x0), p)

    def with_params(self, **updates: float) -> "ODEModel":
        """Returns a copy with some default parameters replaced."""
        new = dict(self.params)
        for k, v in updates.items():
            if k not in new:
                raise KeyError(f"{self.name} has no parameter {k!r}")
            new[k] = jnp.asarray(v, dtype=new[k].dtype) if hasattr(new[k], "dtype") else jnp.asarray(v)
        return dataclasses.replace(self, params=new)


def as_params(**kwargs) -> Params:
    """Converts python floats / lists to a parameter dict of jnp arrays."""
    return {k: jnp.asarray(v) for k, v in kwargs.items()}
