"""Linearization pushforward for square-root covariance propagation.

The square-root EKF needs ``J @ P_sqrt`` where J is the Jacobian of a solver
step — without materializing J. The reference does this with a ``vmap`` of
``jax.jvp`` over tangent columns (/root/reference/src/utils.py:72-87).
Here we use ``jax.linearize``: the nonlinear primal is evaluated **once**,
and the resulting linear map is vmapped over the columns of ``P_sqrt`` —
under XLA the batched tangent ops become single ``[n, n]``-shaped kernels,
ideal for the VPU/MXU.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def push_sqrt(f: Callable, x: jax.Array, p_sqrt: jax.Array):
    """Evaluates y = f(x) and J_f(x) @ P_sqrt in one linearized pass.

    Args:
        f: function taking a flat state [n] and returning a pytree whose
            first element is the next flat state [n] (aux outputs allowed,
            e.g. the local-error estimate).
        x: [n] primal input.
        p_sqrt: [n, k] matrix whose columns are pushed through the
            linearization (typically the covariance sqrt factor, k = n).

    Returns:
        (out, jp) where ``out = f(x)`` (full pytree) and ``jp`` [n, k] is the
        Jacobian of the first output applied to ``p_sqrt``.
    """
    out, f_lin = jax.linearize(f, x)
    # vmap the linear map over columns; only the primary output's tangent is
    # kept (aux tangents are dead code XLA removes).
    cols = jax.vmap(lambda v: f_lin(v)[0], in_axes=1, out_axes=1)(p_sqrt)
    return out, cols


def value_and_jacfwd(f: Callable, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (f(x), dense forward-mode Jacobian)."""
    n = x.shape[-1]
    out, f_lin = jax.linearize(f, x)
    jac = jax.vmap(f_lin, in_axes=1, out_axes=1)(jnp.eye(n, dtype=x.dtype))
    return out, jac


def pull_sqrt(f: Callable, x: jax.Array, m_rows: jax.Array):
    """Reverse-mode alternative to :func:`push_sqrt`: computes ``M @ J_f``
    by vmapping the VJP over the rows of M (parity with the reference's
    unused ``mjp_aux``, src/utils.py:82-87). ``f`` returns (primary, aux).

    Returns (out, mj) with mj [k, n] = m_rows @ J.
    """
    out, vjp_fn, aux = jax.vjp(f, x, has_aux=True)
    rows = jax.vmap(lambda v: vjp_fn(v)[0])(m_rows)
    return (out, aux), rows
