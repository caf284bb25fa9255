"""On-device box-constrained L-BFGS.

Replaces the reference's host-driven scipy L-BFGS-B round-trip
(/root/reference/scripts/run_parameter_estimation.py:599,628-642, via jaxopt
``ScipyBoundedMinimize``): the entire optimize loop — two-loop recursion,
projected backtracking line search, convergence masking — is a single
``lax.while_loop`` program. That makes restarts a ``vmap`` axis (JAX's while
batching rule masks finished lanes automatically), so 1k tempered restarts
run as one compiled program instead of a process pool.

Algorithm: projected L-BFGS (gradient-projection flavor): the quasi-Newton
direction from a ring-buffer two-loop recursion, a backtracking Armijo line
search on the box-projected trial point, curvature-guarded history updates,
and the projected-gradient infinity norm as the stopping criterion. The
reference repo itself contains the (unused) blueprint for this design:
src/utils.py:15-36 ``run_lbfgs_projected``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSResult(NamedTuple):
    x: jax.Array  # [P] final (projected) iterate
    f: jax.Array  # [] objective at x
    g: jax.Array  # [P] gradient at x
    iters: jax.Array  # [] int32 outer iterations taken
    n_fev: jax.Array  # [] int32 objective evaluations (incl. line search)
    converged: jax.Array  # [] bool projected-gradient tolerance reached


class _State(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    s_hist: jax.Array  # [m, P]
    y_hist: jax.Array  # [m, P]
    rho: jax.Array  # [m]
    head: jax.Array  # ring-buffer write position
    count: jax.Array  # valid history entries (<= m)
    iters: jax.Array
    n_fev: jax.Array
    done: jax.Array  # converged or stalled
    stall: jax.Array  # consecutive accepted steps with below-slack progress


def _two_loop(g, s_hist, y_hist, rho, head, count, m):
    """L-BFGS two-loop recursion over a ring buffer with masked slots."""

    def bwd(i, carry):
        q, alpha = carry
        j = (head - 1 - i) % m
        valid = i < count
        a = jnp.where(valid, rho[j] * (s_hist[j] @ q), 0.0)
        q = q - a * y_hist[j]
        return q, alpha.at[j].set(a)

    q, alpha = lax.fori_loop(0, m, bwd, (g, jnp.zeros(m, g.dtype)))

    j_last = (head - 1) % m
    denom = y_hist[j_last] @ y_hist[j_last]
    gamma = jnp.where(
        (count > 0) & (denom > 0.0), (s_hist[j_last] @ y_hist[j_last]) / denom, 1.0
    )
    r = gamma * q

    def fwd(i, r):
        j = (head - count + i) % m
        valid = i < count
        b = rho[j] * (y_hist[j] @ r)
        return r + jnp.where(valid, alpha[j] - b, 0.0) * s_hist[j]

    r = lax.fori_loop(0, m, fwd, r)
    return -r


def lbfgs_box_init(
    fun: Callable,
    x0: jax.Array,
    lower: jax.Array | float = 0.0,
    upper: jax.Array | float = 1.0,
    history: int = 10,
    tol: float = 1e-6,
) -> _State:
    """Builds the initial optimizer state (one objective evaluation)."""
    dtype = x0.dtype
    p = x0.shape[-1]
    lower = jnp.broadcast_to(jnp.asarray(lower, dtype), (p,))
    upper = jnp.broadcast_to(jnp.asarray(upper, dtype), (p,))
    x0 = jnp.clip(x0, lower, upper)
    f0, g0 = jax.value_and_grad(fun)(x0)
    pg = jnp.max(jnp.abs(x0 - jnp.clip(x0 - g0, lower, upper)))
    return _State(
        x=x0,
        f=f0,
        g=g0,
        s_hist=jnp.zeros((history, p), dtype),
        y_hist=jnp.zeros((history, p), dtype),
        rho=jnp.zeros((history,), dtype),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
        n_fev=jnp.ones((), jnp.int32),
        done=pg <= tol,
        stall=jnp.zeros((), jnp.int32),
    )


def lbfgs_box_segment(
    fun: Callable,
    state: _State,
    iter_limit,
    lower: jax.Array | float = 0.0,
    upper: jax.Array | float = 1.0,
    tol: float = 1e-6,
    max_linesearch: int = 25,
    armijo_c1: float = 1e-4,
    stall_iters: int = 5,
) -> _State:
    """Runs the optimizer until convergence or ``iters >= iter_limit``.

    ``iter_limit`` may be traced; calling this in a host loop with an
    increasing limit bounds the duration of each dispatched program (some
    TPU runtimes fault on very long single dispatches) while preserving
    exact L-BFGS semantics across segments.

    ``stall_iters``: with the machine-resolution Armijo slack, near-flat f32
    stages can accept zero-progress steps forever and grind to the iteration
    limit (lbfgs_host observed median 200/200 iterations on the LV2
    gamma=1e-8 stage); a lane making < slack objective progress for this
    many consecutive accepted steps is marked done (0 disables).
    """
    dtype = state.x.dtype
    p = state.x.shape[-1]
    m = state.s_hist.shape[0]
    lower = jnp.broadcast_to(jnp.asarray(lower, dtype), (p,))
    upper = jnp.broadcast_to(jnp.asarray(upper, dtype), (p,))
    value_and_grad = jax.value_and_grad(fun)

    def proj(x):
        return jnp.clip(x, lower, upper)

    def pg_norm(x, g):
        """Infinity norm of the projected gradient (KKT residual)."""
        return jnp.max(jnp.abs(x - proj(x - g)))

    def cond(st: _State):
        return jnp.logical_not(st.done) & (st.iters < iter_limit)

    def body(st: _State) -> _State:
        d = _two_loop(st.g, st.s_hist, st.y_hist, st.rho, st.head, st.count, m)
        # Fall back to steepest descent if the direction is not a descent
        # direction (can happen right after projections distort curvature).
        descent = (st.g @ d) < 0.0
        d = jnp.where(descent, d, -st.g)

        # Backtracking Armijo on the projected path.
        class LS(NamedTuple):
            alpha: jax.Array
            x_t: jax.Array
            f_t: jax.Array
            g_t: jax.Array
            evals: jax.Array
            ok: jax.Array
            tries: jax.Array

        # Sufficient-decrease slack at machine resolution: near-flat stages
        # produce true decreases below the dtype's resolution of f (an f32
        # NLL of ~1e3 cannot represent decreases under ~1e-4); without the
        # slack those read as line-search failures and stall the lane far
        # from the optimum (measured: LV2 f32 best-NLL 32 vs f64 -14.5).
        f_slack = 16.0 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(st.f), 1.0)

        def ls_trial(alpha):
            x_t = proj(st.x + alpha * d)
            f_t, g_t = value_and_grad(x_t)
            # Armijo with the *projected* step (x_t - x).
            decrease = f_t <= st.f + armijo_c1 * (st.g @ (x_t - st.x)) + f_slack
            moved = jnp.max(jnp.abs(x_t - st.x)) > 0.0
            ok = decrease & moved & jnp.isfinite(f_t)
            return x_t, f_t, g_t, ok

        x_t, f_t, g_t, ok = ls_trial(jnp.asarray(1.0, dtype))
        ls0 = LS(
            alpha=jnp.asarray(1.0, dtype),
            x_t=x_t,
            f_t=f_t,
            g_t=g_t,
            evals=jnp.ones((), jnp.int32),
            ok=ok,
            tries=jnp.ones((), jnp.int32),
        )

        def ls_cond(ls: LS):
            return jnp.logical_not(ls.ok) & (ls.tries < max_linesearch)

        def ls_body(ls: LS) -> LS:
            alpha = ls.alpha * 0.5
            x_t, f_t, g_t, ok = ls_trial(alpha)
            return LS(alpha, x_t, f_t, g_t, ls.evals + 1, ok, ls.tries + 1)

        ls = lax.while_loop(ls_cond, ls_body, ls0)

        # Line-search failure handling (parity with scipy L-BFGS-B's
        # restart-on-failure): with quasi-Newton history present, a failed
        # search usually means the curvature model is stale — clear the
        # history so the next iteration backtracks along steepest descent.
        # Only a failure ON the steepest-descent direction itself ends the
        # lane. (The previous stop-on-first-failure rule truncated f32 runs
        # mid-basin.)
        reset = jnp.logical_not(ls.ok) & (st.count > 0)

        s_vec = ls.x_t - st.x
        y_vec = ls.g_t - st.g
        sy = s_vec @ y_vec
        good_curv = ls.ok & (sy > 1e-10 * jnp.linalg.norm(s_vec) * jnp.linalg.norm(y_vec))

        s_hist = jnp.where(good_curv, st.s_hist.at[st.head].set(s_vec), st.s_hist)
        y_hist = jnp.where(good_curv, st.y_hist.at[st.head].set(y_vec), st.y_hist)
        rho = jnp.where(good_curv, st.rho.at[st.head].set(1.0 / sy), st.rho)
        head = jnp.where(reset, 0, jnp.where(good_curv, (st.head + 1) % m, st.head))
        count = jnp.where(reset, 0, jnp.where(good_curv, jnp.minimum(st.count + 1, m), st.count))

        x_new = jnp.where(ls.ok, ls.x_t, st.x)
        f_new = jnp.where(ls.ok, ls.f_t, st.f)
        g_new = jnp.where(ls.ok, ls.g_t, st.g)
        failed_for_good = jnp.logical_not(ls.ok) & jnp.logical_not(reset)
        progressed = (st.f - f_new) > f_slack
        stall = jnp.where(
            ls.ok & jnp.logical_not(progressed), st.stall + 1, jnp.zeros((), jnp.int32)
        )
        done = failed_for_good | (pg_norm(x_new, g_new) <= tol)
        if stall_iters > 0:
            done = done | (stall >= stall_iters)

        return _State(
            x=x_new,
            f=f_new,
            g=g_new,
            s_hist=s_hist,
            y_hist=y_hist,
            rho=rho,
            head=head,
            count=count,
            iters=st.iters + 1,
            n_fev=st.n_fev + ls.evals,
            done=done,
            stall=stall,
        )

    return lax.while_loop(cond, body, state)


def lbfgs_result(state: _State, lower=0.0, upper=1.0, tol: float = 1e-6) -> LBFGSResult:
    """Converts an optimizer state into the public result record."""
    lower = jnp.broadcast_to(jnp.asarray(lower, state.x.dtype), state.x.shape)
    upper = jnp.broadcast_to(jnp.asarray(upper, state.x.dtype), state.x.shape)
    pg = jnp.max(jnp.abs(state.x - jnp.clip(state.x - state.g, lower, upper)))
    return LBFGSResult(
        x=state.x,
        f=state.f,
        g=state.g,
        iters=state.iters,
        n_fev=state.n_fev,
        converged=pg <= tol,
    )


def lbfgs_box(
    fun: Callable,
    x0: jax.Array,
    lower: jax.Array | float = 0.0,
    upper: jax.Array | float = 1.0,
    max_iter: int = 200,
    history: int = 10,
    tol: float = 1e-6,
    max_linesearch: int = 25,
    armijo_c1: float = 1e-4,
) -> LBFGSResult:
    """Minimizes ``fun`` over the box [lower, upper] in one program.

    fun: differentiable ``[P] -> []``. NaN/Inf trial values are treated as
    line-search failures (the backtracking shrinks past them), which is what
    makes tempered filter NLLs — unstable at extreme parameters — optimizable
    without host-side try/except (the reference catches RuntimeError per
    stage instead, run_parameter_estimation.py:657-667).
    """
    state = lbfgs_box_init(fun, x0, lower, upper, history, tol)
    state = lbfgs_box_segment(
        fun,
        state,
        max_iter,
        lower,
        upper,
        tol=tol,
        max_linesearch=max_linesearch,
        armijo_c1=armijo_c1,
    )
    return lbfgs_result(state, lower, upper, tol)
