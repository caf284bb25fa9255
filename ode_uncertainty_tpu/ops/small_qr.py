"""Unrolled Householder QR for small static shapes.

``jnp.linalg.qr`` lowers to LAPACK-style custom calls / blocked loops that
are catastrophically slow for the [2n, n] (n <= 32) factors inside the
filter scan on TPU — each tiny QR becomes serialized scalar-ish work. Since
(m, n) are compile-time constants here, the Householder sweep can be fully
unrolled: n reflector steps, each a handful of batched elementwise/reduce
ops over [..., m, n] tensors that the VPU vectorizes across the restart
batch. No custom calls, no control flow, differentiable by construction.

Only the R factor is produced (the filter algebra never needs Q; see
ops/sqrt_linalg.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Shapes at or below this use the unrolled path; beyond it the generic
# LAPACK-style QR wins (reflector count grows quadratically).
MAX_UNROLLED_DIM = 32


def qr_r_small(a: jax.Array) -> jax.Array:
    """R factor of a thin QR for a [..., m, n] batch with static m >= n.

    Returns [..., n, n] upper-triangular R with R^T R = A^T A (row signs
    unspecified, matching the convention of ``jnp.linalg.qr(mode='r')`` up
    to sign — irrelevant for sqrt-covariance use).
    """
    m, n = a.shape[-2], a.shape[-1]
    if m < n:
        raise ValueError(f"qr_r_small requires m >= n, got {(m, n)}")

    # Scale-equivariant sweep: factor out the matrix magnitude so the
    # reflectors operate at O(1). Without this, factors of magnitude ~1e-10
    # (a resting filter covariance sqrt) give vnorm_sq ~ 1e-20, whose
    # BACKWARD pass terms ~ 1/vnorm_sq^2 overflow float32 and poison the
    # whole NLL gradient with NaN (qr(c*A) = c*qr(A), so rescaling is exact).
    scale = jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale > 0.0, scale, 1.0)
    # Zero-column guard at machine resolution relative to the scaled matrix:
    # a column below ~4*ulp contributes < eps^2 to the covariance sum —
    # numerically zero — and keeping the threshold this high keeps the
    # backward's 1/vnorm_sq^2 far from the dtype's overflow range.
    eps = jnp.asarray((4.0 * jnp.finfo(a.dtype).eps) ** 2, a.dtype)

    r = a / scale
    for j in range(n):
        # Householder reflector zeroing r[..., j+1:, j] against r[..., j, j].
        col = r[..., j:, j]  # [..., m-j]
        sigma = jnp.sqrt(jnp.sum(col * col, axis=-1, keepdims=True))  # [..., 1]
        sign = jnp.where(col[..., :1] >= 0, 1.0, -1.0).astype(a.dtype)
        alpha = -sign * sigma  # R diagonal entry
        v = col.at[..., 0].add((sigma * sign)[..., 0])  # col - alpha*e1
        vnorm_sq = jnp.sum(v * v, axis=-1, keepdims=True)
        # Guard zero columns: reflector becomes identity.
        inv = jnp.where(vnorm_sq > eps, 2.0 / jnp.maximum(vnorm_sq, eps), 0.0)

        block = r[..., j:, j:]  # [..., m-j, n-j]
        coeff = jnp.einsum("...i,...ik->...k", v, block) * inv  # [..., n-j]
        block = block - v[..., :, None] * coeff[..., None, :]
        # Column j is now exactly [alpha, 0, ..., 0].
        block = block.at[..., :, 0].set(0.0)
        block = block.at[..., 0, 0].set(
            jnp.where(vnorm_sq[..., 0] > eps, alpha[..., 0], col[..., 0])
        )
        r = r.at[..., j:, j:].set(block)

    return r[..., :n, :] * scale


def use_unrolled(m: int, n: int) -> bool:
    return n <= MAX_UNROLLED_DIM and m <= 4 * MAX_UNROLLED_DIM
