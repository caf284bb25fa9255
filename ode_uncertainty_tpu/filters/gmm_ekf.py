"""Gaussian-mixture square-root EKF with adaptive split/merge (extension).

Functional equivalent of the reference's deprecated GMM-EKF
(/root/reference/src/filters/deprecated/gmm_ekf.py): a bank of sqrt-EKF
components whose population adapts to the local nonlinearity —

  * **split** (gmm_ekf.py:326-371, :455-560): every component whose
    look-ahead nonlinearity estimate (second-difference of the RHS,
    :234-282) exceeds the threshold splits along its covariance's top
    eigenvector, most-nonlinear first, bounded by free capacity; the
    covariance loses the displaced rank-1 term via a Cholesky downdate.
  * **merge** (:53-152, :285-323): all sufficiently-close pairs under
    Jeffrey divergence are moment-matched greedily (closest pair first,
    each component in at most one pair per step); components slated for
    splitting are excluded from merging (:536-541).
  * **invalidate** (:198-232, :516-520): components with non-finite means,
    below-minimum weight, or farther than the distance threshold from
    EVERY other component (any-dimension absolute delta) are dropped.

TPU-first re-design: the component bank has a **static capacity K** with an
active mask (the reference grows/shrinks arrays and pads per step). The
greedy pairwise merge runs as an unrolled K/2-round sweep with masked
arithmetic; splits scatter into free slots by rank. Everything stays inside
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
    min_weight: float = 0.01
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

    def _split_many(self, state: GMMState, nl: jax.Array) -> GMMState:
        """Splits every component with nl > threshold, most nonlinear first,
        bounded by free capacity (reference :326-371 + capacity logic
        :543-556). The r-th-ranked splitter scatters its twin into the r-th
        free slot."""
        k = self.max_components
        order = jnp.argsort(-nl)  # descending nonlinearity
        num_above = jnp.sum(nl > self.nl_threshold)
        capacity = k - jnp.sum(state.active)
        num_splits = jnp.minimum(num_above, capacity)

        # rank of each component in the split order; rank < num_splits splits
        rank = jnp.zeros(k, jnp.int32).at[order].set(jnp.arange(k, dtype=jnp.int32))
        is_split = (rank < num_splits) & state.active

        # r-th free slot (inactive), by position
        free_order = jnp.argsort(state.active, stable=True)  # inactive slots first
        # twin slot for each splitting component: free_order[rank]
        twin = free_order[jnp.clip(rank, 0, k - 1)]

        evals, evecs = jax.vmap(lambda c: jnp.linalg.eigh(c @ c.T))(state.P_sqrt)
        lam = evals[:, -1]
        d = evecs[:, :, -1]
        disp = self.split_displacement * jnp.sqrt(jnp.maximum(lam, 0.0))[:, None] * d
        chol_zero = jnp.all(jnp.abs(state.P_sqrt) < 1e-6, axis=(-2, -1))
        chol_dn = jax.vmap(
            lambda c, dd, ll: chol_update(c, dd, -(self.split_displacement**2) * ll)
        )(state.P_sqrt, d, lam)
        chol_dn = jnp.where(
            (chol_zero | ~jnp.all(jnp.isfinite(chol_dn), axis=(-2, -1)))[:, None, None],
            state.P_sqrt,
            chol_dn,
        )

        dm = disp.reshape(state.means.shape)
        means = jnp.where(is_split[:, None, None], state.means + dm, state.means)
        chols = jnp.where(is_split[:, None, None], chol_dn, state.P_sqrt)
        weights = jnp.where(is_split, state.weights * 0.5, state.weights)

        # Scatter twins (mean - dm, same downdated chol, half weight) into
        # the free slots; non-splitting rows scatter out of range (dropped).
        tgt = jnp.where(is_split, twin, k)
        means = means.at[tgt].set(state.means - dm, mode="drop")
        chols = chols.at[tgt].set(chol_dn, mode="drop")
        weights = weights.at[tgt].set(state.weights * 0.5, mode="drop")
        active = state.active.at[tgt].set(True, mode="drop")
        eps = state.eps.at[tgt].set(state.eps, mode="drop")

        return state.replace(means=means, P_sqrt=chols, weights=weights, active=active, eps=eps)

    def _merge_pairs(self, state: GMMState, exclude: jax.Array) -> GMMState:
        """Greedy pairwise merging: repeatedly moment-match the closest
        still-unmerged pair under the Jeffrey threshold (reference
        merge_2/compute_merge_mapping, :285-323 — all below-threshold pairs
        merge in one step, each component in at most one pair). ``exclude``
        masks components slated for splitting (:536-541)."""
        k = self.max_components

        def one_round(carry, _):
            s, fresh = carry
            flat = s.means.reshape(k, -1)
            dist = jeffrey_gaussian_sqrt(
                flat[:, None, :], flat[None, :, :], s.P_sqrt[:, None], s.P_sqrt[None, :]
            )
            ok = fresh[:, None] & fresh[None, :]
            dist = jnp.where(ok & ~jnp.eye(k, dtype=bool), dist, _BIG)
            idx = jnp.argmin(dist)
            i, j = jnp.unravel_index(idx, (k, k))
            can = dist.reshape(-1)[idx] < self.merge_threshold

            wi, wj = s.weights[i], s.weights[j]
            w = wi + wj
            safe_w = jnp.where(w > 0, w, 1.0)
            mi, mj = flat[i], flat[j]
            m = (wi * mi + wj * mj) / safe_w
            di = (mi - m) * jnp.sqrt(wi / safe_w)
            dj = (mj - m) * jnp.sqrt(wj / safe_w)
            merged = sqrt_sum(
                jnp.sqrt(wi / safe_w) * s.P_sqrt[i],
                jnp.sqrt(wj / safe_w) * s.P_sqrt[j],
                di[:, None],
                dj[:, None],
            )

            def apply(args):
                s, fresh = args
                means = s.means.at[i].set(m.reshape(s.means.shape[1:]))
                chols = s.P_sqrt.at[i].set(merged)
                weights = s.weights.at[i].set(w).at[j].set(0.0)
                active = s.active.at[j].set(False)
                # a merged component may not merge again this step
                fresh = fresh.at[i].set(False).at[j].set(False)
                return (
                    s.replace(means=means, P_sqrt=chols, weights=weights, active=active),
                    fresh,
                )

            return jax.lax.cond(can, apply, lambda a: a, (s, fresh)), None

        fresh0 = state.active & ~exclude
        (state, _), _ = jax.lax.scan(one_round, (state, fresh0), None, length=k // 2)
        return state

    def _invalidate(self, state: GMMState) -> GMMState:
        """Drops non-finite components, below-minimum-weight components
        (reference ``min_w`` validity gate, :384/:501), and components
        farther than the distance threshold from EVERY other active
        component in some dimension (reference invalidate_by_distance,
        :198-232); keeps at least one."""
        k = self.max_components
        flat = state.means.reshape(k, -1)
        finite = jnp.all(jnp.isfinite(flat), axis=-1)
        delta = jnp.abs(flat[None, :, :] - flat[:, None, :])  # [K, K, n]
        far_pair = jnp.any(delta > self.distance_threshold, axis=-1)  # [K, K]
        other_ok = state.active[None, :] & ~jnp.eye(k, dtype=bool)
        # far from ALL other active components -> invalid
        alone = jnp.all(far_pair | ~other_ok, axis=1) & jnp.any(other_ok, axis=1)
        keep = state.active & finite & ~alone & (state.weights >= self.min_weight)
        keep = jnp.where(jnp.any(keep), keep, state.active)  # never drop all
        weights = jnp.where(keep, state.weights, 0.0)
        total = jnp.maximum(jnp.sum(weights), 1e-30)
        return state.replace(active=keep, weights=weights / total)

    # ------------------------------------------------------------- predict
    def make_predict(self, solver, rhs: Callable):
        ekf_predict = self._ekf().make_predict(solver, rhs)

        def predict(state: GMMState, params, q_sqrt, gamma_sqrt) -> GMMState:
            # Reference order (_predict_jit, :455-560): propagate all
            # components, invalidate, estimate nonlinearity, merge close
            # pairs (split candidates excluded), then split into the slots
            # freed by merging.
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
            state = self._invalidate(state)
            nl = self._nonlinearity(solver, rhs, params, state)
            state = self._merge_pairs(state, exclude=nl > self.nl_threshold)
            return self._split_many(state, nl)

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
