"""Square-root linear-algebra kernels.

These are the hot inner primitives of the square-root filter stack
(parity: /root/reference/src/utils.py:109-128,233-355). All functions are
written for arbitrary leading batch dimensions so a single definition serves
the unbatched filter math and the 1k-wide vmapped estimation path.

Conventions: a "sqrt factor" L satisfies ``cov = L @ L.T``; factors produced
by :func:`sqrt_sum` are lower-triangular up to column sign (the R factor of a
QR transposed), which is irrelevant for every downstream use (products use
``L L^T``; log-determinants use ``|diag|``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve_triangular

from ode_uncertainty_tpu.ops.small_qr import qr_r_small, use_unrolled


def _r_factor(stacked: jax.Array) -> jax.Array:
    """R of a thin QR; unrolled Householder for small static shapes (TPU
    hot path), generic QR otherwise."""
    m, n = stacked.shape[-2], stacked.shape[-1]
    if use_unrolled(m, n):
        return qr_r_small(stacked)
    return jnp.linalg.qr(stacked, mode="r")


def sqrt_sum(*factors: jax.Array) -> jax.Array:
    """Lower-triangular L with L L^T = sum_i F_i F_i^T, via one economy QR.

    Args:
        *factors: two or more arrays [..., n, k_i] (typically square sqrt
            factors). Stacking their transposes gives A with A^T A equal to
            the covariance sum; the QR's R factor transposed is the result.

    Returns:
        [..., n, n] sqrt factor (lower-triangular up to column signs).
    """
    stacked = jnp.concatenate([jnp.swapaxes(f, -1, -2) for f in factors], axis=-2)
    return jnp.swapaxes(_r_factor(stacked), -1, -2)


def tria(a: jax.Array) -> jax.Array:
    """Lower-triangular sqrt factor of ``a @ a.T`` for a single wide factor."""
    return jnp.swapaxes(_r_factor(jnp.swapaxes(a, -1, -2)), -1, -2)


def nll_gaussian_sqrt(x: jax.Array, mean: jax.Array, chol: jax.Array) -> jax.Array:
    """Negative log density of N(mean, chol chol^T) at x.

    Args:
        x: [..., n]. mean: [..., n]. chol: [..., n, n] sqrt factor (triangular
            up to column signs; only |diag| enters the log-determinant).

    Returns:
        [...] negative log likelihood.
    """
    n = x.shape[-1]
    if n == 1:  # scalar observation: avoid a 1x1 LAPACK triangular solve
        z = (x - mean) / chol[..., 0, 0:1]
    else:
        z = solve_triangular(chol, x - mean, lower=True)
    half_maha = 0.5 * jnp.einsum("...i,...i->...", z, z)
    log_det = jnp.log(jnp.abs(jnp.diagonal(chol, axis1=-2, axis2=-1))).sum(-1)
    return half_maha + 0.5 * n * jnp.log(2.0 * jnp.pi) + log_det


def pdf_gaussian_sqrt(x: jax.Array, mean: jax.Array, chol: jax.Array) -> jax.Array:
    """PDF of N(mean, chol chol^T) at x (broadcasting batch dims)."""
    n = x.shape[-1]
    diff = x - mean
    batch = jnp.broadcast_shapes(diff.shape[:-1], chol.shape[:-2])
    diff = jnp.broadcast_to(diff, batch + (n,))
    chol_b = jnp.broadcast_to(chol, batch + (n, n))
    return jnp.exp(-nll_gaussian_sqrt(diff, jnp.zeros_like(diff), chol_b))


def kl_gaussian_sqrt(
    m_p: jax.Array, m_q: jax.Array, s_p: jax.Array, s_q: jax.Array
) -> jax.Array:
    """KL(P || Q) for Gaussians given sqrt covariance factors.

    KL = 0.5 * (logdet Q - logdet P - n + ||S_q^{-1}(m_q - m_p)||^2
         + tr(Q^{-1} P)).
    """
    n = m_p.shape[-1]
    diff = m_q - m_p
    batch = jnp.broadcast_shapes(diff.shape[:-1], s_p.shape[:-2], s_q.shape[:-2])
    diff = jnp.broadcast_to(diff, batch + (n,))
    s_p_b = jnp.broadcast_to(s_p, batch + (n, n))
    s_q_b = jnp.broadcast_to(s_q, batch + (n, n))

    z = solve_triangular(s_q_b, diff, lower=True)
    maha = jnp.einsum("...i,...i->...", z, z)
    # tr(Q^{-1} P) = || S_q^{-1} S_p ||_F^2
    w = solve_triangular(s_q_b, s_p_b, lower=True)
    tr_qp = jnp.einsum("...ij,...ij->...", w, w)
    log_det_p = jnp.log(jnp.abs(jnp.diagonal(s_p_b, axis1=-2, axis2=-1)) + 1e-8).sum(-1)
    log_det_q = jnp.log(jnp.abs(jnp.diagonal(s_q_b, axis1=-2, axis2=-1)) + 1e-8).sum(-1)
    return 0.5 * (2.0 * (log_det_q - log_det_p) - n + maha + tr_qp)


def jeffrey_gaussian_sqrt(m_1, m_2, s_1, s_2) -> jax.Array:
    """Symmetric KL (Jeffrey divergence) between Gaussians."""
    return kl_gaussian_sqrt(m_1, m_2, s_1, s_2) + kl_gaussian_sqrt(m_2, m_1, s_2, s_1)


def cho_solve_sqrt(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solves (chol chol^T) x = b given a (sign-indefinite) triangular factor."""
    if chol.shape[-1] == 1:  # scalar system: division beats a LAPACK call
        return b / (chol[..., 0:1, 0:1] ** 2)
    return cho_solve((chol, True), b)


def const_diag(n: int, value, dtype=None) -> jax.Array:
    """Diagonal matrix with a constant value."""
    return jnp.diag(jnp.full((n,), value, dtype=dtype))
