"""Gaussian-mixture square-root EKF with adaptive split/merge (extension).

Functional equivalent of the reference's deprecated GMM-EKF
(/root/reference/src/filters/deprecated/gmm_ekf.py): a bank of sqrt-EKF
components whose population adapts to the local nonlinearity —

  * **split** (gmm_ekf.py:326-371): the most nonlinear component (estimated
    by a look-ahead second-difference of the RHS, :234-282) splits along its
    covariance's top eigenvector; the covariance loses the displaced rank-1
    term via a Cholesky downdate.
  * **merge** (:53-152): the closest valid pair under Jeffrey divergence is
    moment-matched into one component.
  * **invalidate** (:198-232): components far from the mixture mean (scaled
    Euclidean distance) are dropped.

TPU-first re-design: the component bank has a **static capacity K** with an
active mask (the reference grows/shrinks arrays). One split and one merge per
step (the reference merges greedily in pairs with a scan); weights and
moments are updated with masked arithmetic, so the whole filter stays inside
``jit``/``vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.filters.cov_updates import DiagonalUpdate
from ode_uncertainty_tpu.filters.sqrt_ekf import SqrtEKF
from ode_uncertainty_tpu.ops.chol_update import chol_update
from ode_uncertainty_tpu.ops.sqrt_linalg import (
    jeffrey_gaussian_sqrt,
    pdf_gaussian_sqrt,
    sqrt_sum,
)

_BIG = 1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GMMState:
    """Mixture bank (K = static capacity, n = flat state size)."""

    t: jax.Array  # []
    means: jax.Array  # [K, N, D]
    P_sqrt: jax.Array  # [K, n, n]
    eps: jax.Array  # [K, N, D]
    weights: jax.Array  # [K] (inactive slots have weight 0)
    active: jax.Array  # [K] bool

    def replace(self, **kw) -> "GMMState":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class GMMSqrtEKF:
    """Adaptive Gaussian-mixture sqrt-EKF."""

    cov_update: object = DiagonalUpdate()
    max_components: int = 8
    nl_threshold: float = 0.1
    merge_threshold: float = 1.0
    split_displacement: float = 0.5
    distance_threshold: float = 100.0
    disable_cov_update: bool = False

    def _ekf(self) -> SqrtEKF:
        return SqrtEKF(cov_update=self.cov_update, disable_cov_update=self.disable_cov_update)

    def init_state(self, t0, x0: jax.Array, p0_sqrt: jax.Array) -> GMMState:
        k = self.max_components
        dtype = x0.dtype
        n = x0.size
        means = jnp.zeros((k,) + x0.shape, dtype).at[0].set(x0)
        chols = jnp.zeros((k, n, n), dtype).at[0].set(p0_sqrt.astype(dtype))
        return GMMState(
            t=jnp.asarray(t0, dtype),
            means=means,
            P_sqrt=chols,
            eps=jnp.zeros((k,) + x0.shape, dtype),
            weights=jnp.zeros((k,), dtype).at[0].set(1.0),
            active=jnp.zeros((k,), bool).at[0].set(True),
        )

    # ----------------------------------------------------------- adaptation
    def _nonlinearity(self, solver, rhs, params, state: GMMState) -> jax.Array:
        """Look-ahead curvature estimate per component: ||(f(x') - f(x))/h||."""

        def one(x):
            dx = rhs(state.t, x, params)
            x_next, _ = solver.step(rhs, params, state.t, x)
            dx_next = rhs(state.t + solver.h, x_next, params)
            return jnp.linalg.norm((dx_next[0] - dx[0]) / solver.h)

        nl = jax.vmap(one)(state.means)
        return jnp.where(state.active, nl, -jnp.inf)

    def _split_one(self, state: GMMState, nl: jax.Array) -> GMMState:
        """Splits the most nonlinear component into a free slot (if any)."""
        src = jnp.argmax(nl)
        free = jnp.argmin(state.active)  # first inactive slot
        can = (~jnp.all(state.active)) & (nl[src] > self.nl_threshold)

        n = state.P_sqrt.shape[-1]
        chol = state.P_sqrt[src]
        evals, evecs = jnp.linalg.eigh(chol @ chol.T)
        lam = evals[-1]
        d = evecs[:, -1]
        disp = self.split_displacement * jnp.sqrt(jnp.maximum(lam, 0.0)) * d
        chol_zero = jnp.all(jnp.abs(chol) < 1e-6)
        chol_dn = jnp.where(
            chol_zero,
            chol,
            chol_update(chol, d, -(self.split_displacement**2) * lam),
        )
        chol_dn = jnp.where(jnp.all(jnp.isfinite(chol_dn)), chol_dn, chol)

        mean_src = state.means[src]
        dm = disp.reshape(mean_src.shape)
        w_half = state.weights[src] * 0.5

        def apply(s: GMMState) -> GMMState:
            means = s.means.at[src].set(mean_src + dm).at[free].set(mean_src - dm)
            chols = s.P_sqrt.at[src].set(chol_dn).at[free].set(chol_dn)
            weights = s.weights.at[src].set(w_half).at[free].set(w_half)
            active = s.active.at[free].set(True)
            return s.replace(means=means, P_sqrt=chols, weights=weights, active=active)

        return jax.lax.cond(can, apply, lambda s: s, state)

    def _merge_one(self, state: GMMState) -> GMMState:
        """Moment-matches the closest pair under Jeffrey divergence."""
        k = self.max_components
        flat = state.means.reshape(k, -1)
        dist = jeffrey_gaussian_sqrt(
            flat[:, None, :], flat[None, :, :], state.P_sqrt[:, None], state.P_sqrt[None, :]
        )
        pair_ok = state.active[:, None] & state.active[None, :]
        dist = jnp.where(pair_ok, dist, _BIG)
        dist = jnp.where(jnp.eye(k, dtype=bool), _BIG, dist)
        idx = jnp.argmin(dist)
        i, j = jnp.unravel_index(idx, (k, k))
        can = dist.reshape(-1)[idx] < self.merge_threshold

        wi, wj = state.weights[i], state.weights[j]
        w = wi + wj
        safe_w = jnp.where(w > 0, w, 1.0)
        mi, mj = flat[i], flat[j]
        m = (wi * mi + wj * mj) / safe_w
        # sqrt of the moment-matched covariance: stacked sqrt factors of the
        # weighted components plus the two mean-offset rank-1 terms
        di = (mi - m) * jnp.sqrt(wi / safe_w)
        dj = (mj - m) * jnp.sqrt(wj / safe_w)
        merged = sqrt_sum(
            jnp.sqrt(wi / safe_w) * state.P_sqrt[i],
            jnp.sqrt(wj / safe_w) * state.P_sqrt[j],
            di[:, None],
            dj[:, None],
        )

        def apply(s: GMMState) -> GMMState:
            means = s.means.at[i].set(m.reshape(s.means.shape[1:]))
            chols = s.P_sqrt.at[i].set(merged)
            weights = s.weights.at[i].set(w).at[j].set(0.0)
            active = s.active.at[j].set(False)
            return s.replace(means=means, P_sqrt=chols, weights=weights, active=active)

        return jax.lax.cond(can, apply, lambda s: s, state)

    def _invalidate(self, state: GMMState) -> GMMState:
        """Drops components far from the mixture mean (keeps at least one)."""
        k = self.max_components
        flat = state.means.reshape(k, -1)
        w = state.weights / jnp.maximum(jnp.sum(state.weights), 1e-30)
        center = w @ flat
        d = jnp.linalg.norm(flat - center[None, :], axis=-1)
        keep = state.active & (d <= self.distance_threshold)
        keep = jnp.where(jnp.any(keep), keep, state.active)  # never drop all
        weights = jnp.where(keep, state.weights, 0.0)
        total = jnp.maximum(jnp.sum(weights), 1e-30)
        return state.replace(active=keep, weights=weights / total)

    # ------------------------------------------------------------- predict
    def make_predict(self, solver, rhs: Callable):
        ekf_predict = self._ekf().make_predict(solver, rhs)

        def predict(state: GMMState, params, q_sqrt, gamma_sqrt) -> GMMState:
            state = self._split_one(state, self._nonlinearity(solver, rhs, params, state))

            def one(mean, chol, eps):
                from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState

                sub = EKFState(
                    t=state.t,
                    x=mean,
                    eps=eps,
                    P_sqrt=chol,
                    y_hat=jnp.zeros((0,), mean.dtype),
                    S_sqrt=jnp.zeros((0, 0), mean.dtype),
                )
                out = ekf_predict(sub, params, q_sqrt, gamma_sqrt)
                return out.x, out.P_sqrt, out.eps

            means, chols, eps = jax.vmap(one)(state.means, state.P_sqrt, state.eps)
            state = state.replace(
                t=state.t + solver.h, means=means, P_sqrt=chols, eps=eps
            )
            state = self._merge_one(state)
            return self._invalidate(state)

        return predict

    # ------------------------------------------------------------- correct
    def make_correct(self):
        ekf_correct = self._ekf().make_correct()

        def correct(state: GMMState, H, y, r_sqrt) -> GMMState:
            from ode_uncertainty_tpu.filters.sqrt_ekf import EKFState

            def one(mean, chol, eps):
                sub = EKFState(
                    t=state.t,
                    x=mean,
                    eps=eps,
                    P_sqrt=chol,
                    y_hat=jnp.zeros((H.shape[0],), mean.dtype),
                    S_sqrt=jnp.zeros((H.shape[0], H.shape[0]), mean.dtype),
                )
                out = ekf_correct(sub, H, y, r_sqrt)
                lik = pdf_gaussian_sqrt(y, out.y_hat, out.S_sqrt)
                return out.x, out.P_sqrt, lik

            means, chols, liks = jax.vmap(one)(state.means, state.P_sqrt, state.eps)
            w = state.weights * jnp.where(state.active, liks, 0.0)
            total = jnp.sum(w)
            # degenerate case (all likelihoods ~0): keep previous weights
            w = jnp.where(total > 1e-30, w / jnp.maximum(total, 1e-30), state.weights)
            return state.replace(means=means, P_sqrt=chols, weights=w)

        return correct

    # ------------------------------------------------------------ estimate
    @staticmethod
    def mixture_moments(state: GMMState):
        """Returns (mean [N, D], covariance [n, n]) of the mixture."""
        k = state.means.shape[0]
        flat = state.means.reshape(k, -1)
        w = state.weights / jnp.maximum(jnp.sum(state.weights), 1e-30)
        mean = w @ flat
        dev = flat - mean[None, :]
        covs = jnp.einsum("kij,klj->kil", state.P_sqrt, state.P_sqrt)
        cov = jnp.einsum("k,kij->ij", w, covs) + jnp.einsum("k,ki,kj->ij", w, dev, dev)
        return mean.reshape(state.means.shape[1:]), cov
