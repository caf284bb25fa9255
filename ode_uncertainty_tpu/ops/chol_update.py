"""Rank-1 Cholesky update / downdate.

Computes the Cholesky factor of ``L L^T + sign * v v^T`` without refactoring
— needed by the square-root UKF (negative w0 sigma weight) and the GMM-EKF
split (covariance downdate along the split direction). The reference uses
``tfp.math.cholesky_update``; this is a from-scratch implementation of the
classic hyperbolic-rotation sweep, unrolled over the (small, static) size so
it vectorizes over leading batch dims on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_update(chol: jax.Array, v: jax.Array, multiplier: float | jax.Array = 1.0) -> jax.Array:
    """Cholesky factor of ``chol @ chol.T + multiplier * outer(v, v)``.

    Args:
        chol: [..., n, n] lower-triangular factor.
        v: [..., n] update vector.
        multiplier: scalar (positive: update, negative: downdate). A downdate
            that would make the matrix indefinite produces NaNs, matching the
            tfp primitive's contract.

    Returns:
        [..., n, n] updated lower-triangular factor.
    """
    n = chol.shape[-1]
    mult = jnp.asarray(multiplier, chol.dtype)
    # Work on copies; the sweep mutates column by column.
    l_cols = [chol[..., :, j] for j in range(n)]  # each [..., n]
    w = v * jnp.sqrt(jnp.abs(mult))
    sign = jnp.sign(mult)

    out_cols = []
    b = jnp.ones(chol.shape[:-2], chol.dtype)
    for j in range(n):
        ljj = l_cols[j][..., j]
        wj = w[..., j]
        d = ljj**2 + sign * (wj**2) / b
        d = jnp.where(d > 0, d, jnp.nan)  # indefinite downdate -> NaN
        new_ljj = jnp.sqrt(d)
        gamma = ljj**2 * b + sign * wj**2

        col = l_cols[j]
        # update trailing part of w
        w = w - (wj / jnp.where(ljj == 0, 1.0, ljj))[..., None] * col
        scale = (new_ljj / jnp.where(ljj == 0, 1.0, ljj))[..., None]
        corr = (new_ljj * wj / jnp.where(gamma == 0, 1.0, gamma))[..., None]
        new_col = scale * col + sign * corr * w
        # zero the strictly-upper part of the column (rows < j)
        row_ids = jnp.arange(n)
        mask = row_ids >= j
        new_col = jnp.where(mask, new_col, 0.0)
        new_col = new_col.at[..., j].set(new_ljj)
        out_cols.append(new_col)
        b = b + sign * wj**2 / jnp.where(ljj == 0, 1.0, ljj) ** 2

    return jnp.stack(out_cols, axis=-1)
