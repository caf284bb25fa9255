"""Tempered maximum-likelihood parameter estimation.

The reference's centerpiece (scripts/run_parameter_estimation.py:optimize)
re-architected for TPUs:

  reference                           this framework
  ------------------------------      ------------------------------------
  p_umap over spawned processes,      one jitted program: restarts are a
  one scipy L-BFGS-B per restart      vmapped axis of an on-device L-BFGS
  Python loop over tempering          lax.scan over a traced gamma vector
  stages, re-jitting + cache          (zero recompiles across stages)
  clearing per stage
  results pickled back per worker     dense [R, S, P] result tensors

The whole (restarts x stages) sweep is one XLA program; sharding the restart
axis over a device mesh scales it to a pod slice (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ode_uncertainty_tpu.inference.lbfgs import lbfgs_box
from ode_uncertainty_tpu.inference.params import ParamSpec


class EstimationResult(NamedTuple):
    """Result tensors (H5-schema compatible with the reference, §2.6)."""

    params_inits: jax.Array  # [R, P_opt] physical initial params
    params_optims: jax.Array  # [R, S, P_opt] physical optima per stage
    nll_optims: jax.Array  # [R, S]
    num_lbfgs_iters: jax.Array  # [R, S]
    num_nll_evals: jax.Array  # [R, S]
    gammas: jax.Array  # [S]


def make_tempered_estimator(
    nll: Callable,
    spec: ParamSpec,
    q_sqrt: jax.Array,
    max_iter: int = 200,
    tol: float = 1e-6,
    history: int = 10,
    stage_scan: bool = True,
):
    """Builds the batched tempered estimator.

    Args:
        nll: ``(p_norm_opt [P_opt], q_sqrt, gamma_sqrt) -> []`` (from
            :func:`ode_uncertainty_tpu.inference.nll.make_nll`).
        q_sqrt: [n, n] process-noise sqrt structure (gamma scales it).
        stage_scan: if True, tempering stages run as a lax.scan inside one
            program; if False, stages loop on the host around one jitted
            per-stage program (identical semantics — gamma is traced either
            way, so there is exactly one compilation — but each dispatched
            program is smaller, which matters on TPU runtimes that choke on
            deeply nested scan-of-while programs).

    Returns:
        ``estimate(p0_norm [R, P_opt], gammas [S]) -> EstimationResult``.
    """

    def one_stage(p, gamma):
        return lbfgs_box(
            lambda q: nll(q, q_sqrt, jnp.sqrt(gamma)),
            p,
            0.0,
            1.0,
            max_iter=max_iter,
            tol=tol,
            history=history,
        )

    if stage_scan:

        def run_one(p0_norm, gammas):
            def stage(p, gamma):
                res = one_stage(p, gamma)
                return res.x, (res.x, res.f, res.iters, res.n_fev)

            _, (xs, fs, iters, fevs) = lax.scan(stage, p0_norm, gammas)
            return xs, fs, iters, fevs

        @jax.jit
        def estimate(p0_norm: jax.Array, gammas: jax.Array) -> EstimationResult:
            xs, fs, iters, fevs = jax.vmap(run_one, in_axes=(0, None))(p0_norm, gammas)
            return EstimationResult(
                params_inits=spec.opt_to_physical(p0_norm),
                params_optims=spec.opt_to_physical(xs),
                nll_optims=fs,
                num_lbfgs_iters=iters,
                num_nll_evals=fevs,
                gammas=gammas,
            )

        return estimate

    # Host-looped stages with segmented L-BFGS: each dispatched program runs
    # at most ``segment_iters`` optimizer iterations, bounding single-dispatch
    # duration/size (long nested-while programs intermittently fault some TPU
    # runtimes). Semantics identical to the one-program path.
    from ode_uncertainty_tpu.inference.lbfgs import (
        lbfgs_box_init,
        lbfgs_box_segment,
        lbfgs_result,
    )

    # First dispatch is compile-tainted, so start with a modest iteration
    # budget and let the adaptive sizing below grow it toward target_s.
    segment_iters = min(8, max(1, max_iter))

    def obj(p, gamma):
        return nll(p, q_sqrt, jnp.sqrt(gamma))

    @jax.jit
    def init_batched(p, gamma):
        return jax.vmap(lambda pp: lbfgs_box_init(lambda z: obj(z, gamma), pp, 0.0, 1.0, history, tol))(p)

    @jax.jit
    def segment_batched(state, gamma, limit):
        return jax.vmap(
            lambda st: lbfgs_box_segment(
                lambda z: obj(z, gamma), st, limit, 0.0, 1.0, tol=tol
            )
        )(state)

    @jax.jit
    def result_batched(state):
        return jax.vmap(lambda st: lbfgs_result(st, 0.0, 1.0, tol))(state)

    def estimate(p0_norm: jax.Array, gammas: jax.Array) -> EstimationResult:
        import time

        import numpy as np

        # Single dispatches beyond ~90s fault this TPU runtime; adapt the
        # per-dispatch iteration budget toward this wall-clock target.
        target_s = 25.0

        p = p0_norm
        outs = []
        seg = float(segment_iters)
        for s in range(gammas.shape[0]):
            gamma = gammas[s]
            state = jax.block_until_ready(init_batched(p, gamma))
            limit = int(np.min(np.asarray(state.iters))) + max(2, int(seg))
            while True:
                t0 = time.perf_counter()
                state = jax.block_until_ready(segment_batched(state, gamma, limit))
                elapsed = time.perf_counter() - t0
                if bool(jnp.all(state.done | (state.iters >= max_iter))):
                    break
                # adapt: aim for target_s per dispatch (compile-tainted first
                # calls only make segments conservative)
                rate = max(2.0, int(seg) * target_s / max(elapsed, 1e-3))
                seg = min(rate, float(max_iter))
                limit = min(limit + max(2, int(seg)), max_iter)
            res = result_batched(state)
            p = res.x
            outs.append(res)
        stack = lambda f: jnp.stack([getattr(o, f) for o in outs], axis=1)
        return EstimationResult(
            params_inits=spec.opt_to_physical(p0_norm),
            params_optims=spec.opt_to_physical(stack("x")),
            nll_optims=stack("f"),
            num_lbfgs_iters=stack("iters"),
            num_nll_evals=stack("n_fev"),
            gammas=gammas,
        )

    return estimate


def make_stage_optimizer(
    nll: Callable,
    q_sqrt: jax.Array,
    max_iter: int = 200,
    tol: float = 1e-6,
    history: int = 10,
    target_s: float = 25.0,
    initial_segment: int = 1,
):
    """Returns ``stage(p0_norm [R, P], gamma) -> LBFGSResult`` running one
    tempering stage as adaptively-sized L-BFGS segments (each dispatched
    program bounded in wall-clock; see make_tempered_estimator notes)."""
    import time

    import numpy as np

    from ode_uncertainty_tpu.inference.lbfgs import (
        lbfgs_box_init,
        lbfgs_box_segment,
        lbfgs_result,
    )

    def obj(p, gamma):
        return nll(p, q_sqrt, jnp.sqrt(gamma))

    @jax.jit
    def init_batched(p, gamma):
        return jax.vmap(lambda pp: lbfgs_box_init(lambda z: obj(z, gamma), pp, 0.0, 1.0, history, tol))(p)

    @jax.jit
    def segment_batched(state, gamma, limit):
        return jax.vmap(
            lambda st: lbfgs_box_segment(lambda z: obj(z, gamma), st, limit, 0.0, 1.0, tol=tol)
        )(state)

    @jax.jit
    def result_batched(state):
        return jax.vmap(lambda st: lbfgs_result(st, 0.0, 1.0, tol))(state)

    def stage(p0_norm, gamma):
        state = jax.block_until_ready(init_batched(p0_norm, gamma))
        seg = float(initial_segment)
        limit = int(np.min(np.asarray(state.iters))) + max(1, int(seg))
        while True:
            t0 = time.perf_counter()
            state = jax.block_until_ready(segment_batched(state, gamma, limit))
            elapsed = time.perf_counter() - t0
            if bool(jnp.all(state.done | (state.iters >= max_iter))):
                break
            seg = min(max(1.0, int(seg) * target_s / max(elapsed, 1e-3)), float(max_iter))
            limit = min(limit + max(1, int(seg)), max_iter)
        return result_batched(state)

    return stage


def make_nll_landscape(
    nll: Callable,
    q_sqrt: jax.Array,
    batch_size: int = 256,
    timings_out: list | None = None,
):
    """NLL grid evaluation (parity: run_parameter_estimation.py:evaluate).

    Returns ``landscape(p_norm_grid [G, P_opt], gammas [S]) -> [S, G]``.
    The reference loops the grid in Python, one jitted call per point
    (:491); here the grid is a vmapped axis evaluated in chunks.

    ``timings_out``: when a list is given, each device batch is synchronized
    and timed, appending ``(points_in_batch, seconds)`` per dispatch (in
    stage-major order); leaving it ``None`` keeps dispatch fully async.
    """

    @jax.jit
    def eval_batch(p_batch, gamma):
        return jax.vmap(lambda p: nll(p, q_sqrt, jnp.sqrt(gamma)))(p_batch)

    def landscape(p_norm_grid: jax.Array, gammas) -> jax.Array:
        g = p_norm_grid.shape[0]
        pad = (-g) % batch_size
        padded = jnp.concatenate(
            [p_norm_grid, jnp.zeros((pad, p_norm_grid.shape[1]), p_norm_grid.dtype)]
        )
        chunks = padded.reshape(-1, batch_size, p_norm_grid.shape[1])
        rows = []
        for gamma in gammas:
            if timings_out is None:
                vals = jnp.concatenate([eval_batch(c, gamma) for c in chunks])[:g]
            else:
                remaining, parts = g, []
                for c in chunks:
                    t0 = time.perf_counter()
                    v = jax.block_until_ready(eval_batch(c, gamma))
                    timings_out.append(
                        (min(batch_size, remaining), time.perf_counter() - t0)
                    )
                    remaining -= batch_size
                    parts.append(v)
                vals = jnp.concatenate(parts)[:g]
            rows.append(vals)
        return jnp.stack(rows)

    return landscape
