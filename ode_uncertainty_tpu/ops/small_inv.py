"""Unrolled Gauss-Jordan inverse for tiny matrices (n <= 8).

Why not ``jnp.linalg.inv`` / ``lu_solve``: inside a 10^4-step ``lax.scan``
the per-step latency is set by HLO op count, not FLOPs — the implicit
(Kvaerno3) Hodgkin-Huxley filter step is latency-bound at ~3.5 ms/step on
v5e with the LAPACK-style LU path (pivot selection, permutation gathers,
triangular-solve loops are dozens of tiny ops each). An unrolled
pivot-free Gauss-Jordan sweep is n fused outer-product updates, all
elementwise/VPU-friendly, and batches over any leading dims.

Pivot-free is safe here by construction: the only caller inverts the
simplified-Newton matrix ``M = I - h*gamma*J``, which is a perturbation of
the identity (h*gamma is a fraction of the step size), strongly diagonally
dominant for every shipped stiff problem. For general matrices use
``jnp.linalg.inv``.

Parity note: the reference has no equivalent — it delegates implicit
solves to diffrax's internal LU (diffrax_solver.py); this op exists to
make the TPU-native SDIRK path (solvers/sdirk.py) latency-lean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv_small(a: jax.Array) -> jax.Array:
    """Inverse of ``a`` [..., n, n] via unrolled pivot-free Gauss-Jordan.

    Exact for well-conditioned diagonally-dominant matrices (the
    simplified-Newton case). n is static and should be <= ~8: the sweep
    unrolls to n rank-1 updates on the [..., n, 2n] augmented matrix.
    """
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    m = jnp.concatenate([a, eye], axis=-1)  # [..., n, 2n]
    for j in range(n):
        pivot = m[..., j : j + 1, j : j + 1]  # [..., 1, 1]
        row = m[..., j : j + 1, :] / pivot  # [..., 1, 2n]
        col = m[..., :, j : j + 1]  # [..., n, 1]
        # One rank-1 update eliminates column j from every row (row j
        # zeroes itself: m[j,:] - pivot*row == 0), then row j is restored.
        m = m - col * row
        m = jnp.concatenate([m[..., :j, :], row, m[..., j + 1 :, :]], axis=-2)
    return m[..., :, n:]
