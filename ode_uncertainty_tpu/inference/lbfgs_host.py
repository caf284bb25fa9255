"""Host-driven batched box L-BFGS (TPU-runtime-robust estimation path).

Same mathematics as :mod:`ode_uncertainty_tpu.inference.lbfgs` (projected
L-BFGS, two-loop recursion, Armijo backtracking with machine-resolution
slack, history reset on line-search failure), but restructured for runtimes
that cannot reliably execute ``vmap(while(value_and_grad(scan)))`` programs:
the remote-TPU stack used in this environment intermittently kernel-faults
on exactly that shape at any useful batch width (measured: 32/128/512-wide
LV stages all died), while plain batched NLL(+grad) programs of the same
total FLOPs run flawlessly at batch 8192.

So the division of labor here is:

  device: ``vmap(value_and_grad(nll))`` — one dispatch per optimizer
          iteration — and a ``[R, K]``-shaped forward-only program that
          tries K line-search step sizes per dispatch;
  host:   the O(R * P) bookkeeping (two-loop recursion over the history
          ring, projection, Armijo acceptance, convergence masks) in numpy —
          microseconds per iteration at P <= 32, R <= 4096.

Three dispatch-economy devices matter for the implicit-solver problems,
where one batched NLL+grad dispatch costs tens of seconds:

  * **optimistic first step**: the unit step alpha=1 is evaluated with the
    value_and_grad program directly; when it satisfies Armijo (the common
    case once the quasi-Newton model is warm) the iteration costs ONE
    dispatch — the K-trial forward program runs only for lanes that
    rejected the unit step.
  * **stall stop**: with the machine-resolution Armijo slack, near-flat
    f32 stages can accept zero-progress steps forever and grind to
    max_iter (observed: LV2 stage gamma=1e-8 median 200/200 iterations).
    A lane that makes < slack objective progress for ``stall_iters``
    consecutive accepted steps is marked done.
  * **bucket compaction**: converged lanes don't come for free — the
    dispatch cost is set by the batch width. When the active-lane count
    drops to half a power-of-2 bucket, the batch is compacted (gathered)
    into the smaller bucket; each bucket shape compiles once and is cached
    across stages and restart chunks.

The dispatch overhead (~10-100 ms against the remote TPU) is amortized by
the batched objective evaluation; the win is that every dispatched program
is small, static, and loop-free, which this runtime executes reliably.

The reference's execution model is the same division (scipy L-BFGS-B on the
host driving a jitted NLL, run_parameter_estimation.py:599) — done once per
restart in a process pool; here one host loop drives all restarts in
lockstep.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np


class HostLBFGSResult(NamedTuple):
    x: np.ndarray  # [R, P]
    f: np.ndarray  # [R]
    g: np.ndarray  # [R, P]
    iters: np.ndarray  # [R] int32
    n_fev: np.ndarray  # [R] int32
    converged: np.ndarray  # [R] bool


def _two_loop_batched(g, s_hist, y_hist, rho, head, count, m):
    """Vectorized two-loop recursion: g [R,P]; histories [m,R,P]; rho [m,R];
    head/count [R]. Returns the quasi-Newton direction -H g [R, P]."""
    r_idx = np.arange(g.shape[0])
    q = g.copy()
    alpha = np.zeros((m, g.shape[0]), g.dtype)
    for i in range(m):
        j = (head - 1 - i) % m  # [R]
        valid = i < count  # [R]
        s_j = s_hist[j, r_idx]  # [R, P]
        y_j = y_hist[j, r_idx]
        a = np.where(valid, rho[j, r_idx] * np.einsum("rp,rp->r", s_j, q), 0.0)
        q -= a[:, None] * y_j
        alpha[j, r_idx] = a

    j_last = (head - 1) % m
    y_l = y_hist[j_last, r_idx]
    s_l = s_hist[j_last, r_idx]
    denom = np.einsum("rp,rp->r", y_l, y_l)
    gamma = np.where(
        (count > 0) & (denom > 0.0), np.einsum("rp,rp->r", s_l, y_l) / np.where(denom > 0, denom, 1.0), 1.0
    )
    r = gamma[:, None] * q
    for i in range(m):
        j = (head - count + i) % m
        valid = i < count
        s_j = s_hist[j, r_idx]
        y_j = y_hist[j, r_idx]
        b = rho[j, r_idx] * np.einsum("rp,rp->r", y_j, r)
        r += np.where(valid, alpha[j, r_idx] - b, 0.0)[:, None] * s_j
    return -r


def _bucket(n: int, top: int, min_bucket: int = 16) -> int:
    """Smallest allowed dispatch width >= n: a power of two, capped at the
    full batch width ``top`` (which is always an allowed bucket — it is the
    shape the first dispatch compiled anyway)."""
    if n >= top:
        return top
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, top)


def lbfgs_box_host(
    value_and_grad_batched: Callable[[np.ndarray], tuple],
    value_batched_k: Callable[[np.ndarray], np.ndarray],
    x0: np.ndarray,
    lower: float = 0.0,
    upper: float = 1.0,
    max_iter: int = 200,
    history: int = 10,
    tol: float = 1e-6,
    max_linesearch: int = 25,
    ls_block: int = 5,
    armijo_c1: float = 1e-4,
    f32: bool = True,
    stall_iters: int = 5,
    compact: bool = True,
    progress: Callable[[int, np.ndarray], None] | None = None,
) -> HostLBFGSResult:
    """Minimizes a batched objective over the box [lower, upper]^P.

    Args:
        value_and_grad_batched: ``[B, P] -> (f [B], g [B, P])`` device call
            (any batch width B; widths are padded to power-of-2 buckets so
            at most log2(R) shapes ever compile).
        value_batched_k: ``[B, K, P] -> f [B, K]`` forward-only device call
            (K = ``ls_block`` line-search trial step sizes per dispatch).
        x0: [R, P] initial points.
        f32: objective dtype is float32 (sets the Armijo slack scale).
        stall_iters: stop a lane after this many consecutive accepted steps
            with below-slack objective progress (0 disables).
        compact: gather active lanes into power-of-2 dispatch buckets as
            lanes converge (see module docstring).
        progress: optional callback ``(iteration, done_mask)``.
    """
    x = np.clip(np.asarray(x0, np.float64), lower, upper)
    r, p = x.shape
    m = history
    eps_f = np.finfo(np.float32).eps if f32 else np.finfo(np.float64).eps

    def vg_at(idx):
        """value_and_grad at x-rows ``idx``, padded to a bucket width."""
        b = _bucket(len(idx), r) if compact else r
        pad = np.zeros(b - len(idx), np.int64)  # pad with lane .0 (discarded)
        sel = np.concatenate([idx, pad]) if len(idx) < b else idx
        fb, gb = value_and_grad_batched(x_trial[sel])
        return np.asarray(fb, np.float64)[: len(idx)], np.asarray(gb, np.float64)[: len(idx)]

    def fk_at(trials):
        """[n, K, P] forward trials, padded to a bucket width."""
        n = trials.shape[0]
        b = _bucket(n, r) if compact else r
        if n < b:
            trials = np.concatenate([trials, np.repeat(trials[:1], b - n, axis=0)])
        fb = np.asarray(value_batched_k(trials), np.float64)
        return fb[:n]

    x_trial = x  # vg_at closes over the current trial matrix
    f, g = vg_at(np.arange(r))
    n_fev = np.ones(r, np.int32)
    iters = np.zeros(r, np.int32)

    s_hist = np.zeros((m, r, p))
    y_hist = np.zeros((m, r, p))
    rho = np.zeros((m, r))
    head = np.zeros(r, np.int64)
    count = np.zeros(r, np.int64)
    stall = np.zeros(r, np.int32)

    def pg_norm(x_, g_):
        return np.max(np.abs(x_ - np.clip(x_ - g_, lower, upper)), axis=-1)

    done = pg_norm(x, g) <= tol
    r_idx = np.arange(r)

    for it in range(max_iter):
        if done.all():
            break
        act = np.nonzero(~done)[0]
        d = _two_loop_batched(g, s_hist, y_hist, rho, head, count, m)
        descent = np.einsum("rp,rp->r", g, d) < 0.0
        d = np.where(descent[:, None], d, -g)
        f_slack = 16.0 * eps_f * np.maximum(np.abs(f), 1.0)

        # --- optimistic unit step: ONE value_and_grad dispatch ------------
        x_t = np.clip(x + d, lower, upper)
        x_trial = x_t
        f1, g1 = vg_at(act)
        n_fev[act] += 1
        gs1 = np.einsum("rp,rp->r", x_t[act] - x[act], g[act])
        moved1 = np.max(np.abs(x_t[act] - x[act]), axis=-1) > 0.0
        acc1 = (f1 <= f[act] + armijo_c1 * gs1 + f_slack[act]) & moved1 & np.isfinite(f1)

        ok = np.zeros(r, bool)
        have_grad = np.zeros(r, bool)
        f_new = f.copy()
        g_new = g.copy()
        x_new = x.copy()
        ia = act[acc1]
        x_new[ia] = x_t[ia]
        f_new[ia] = f1[acc1]
        g_new[ia] = g1[acc1]
        ok[ia] = True
        have_grad[ia] = True

        # --- blocked backtracking for lanes that rejected the unit step ---
        rej = act[~acc1]
        alpha0 = np.full(r, 0.5)  # unit step already tried
        tries = np.zeros(r, np.int32)
        while len(rej) and tries[rej].min() < max_linesearch - 1:
            alphas = alpha0[rej, None] * (0.5 ** np.arange(ls_block))[None, :]  # [n, K]
            trials = np.clip(x[rej, None, :] + alphas[..., None] * d[rej, None, :], lower, upper)
            f_trials = fk_at(trials)  # [n, K]
            n_fev[rej] += ls_block
            gs = np.einsum("rkp,rp->rk", trials - x[rej, None, :], g[rej])
            moved = np.max(np.abs(trials - x[rej, None, :]), axis=-1) > 0.0
            accept = (
                (f_trials <= f[rej, None] + armijo_c1 * gs + f_slack[rej, None])
                & moved
                & np.isfinite(f_trials)
            )
            any_ok = accept.any(axis=1)
            k_first = np.argmax(accept, axis=1)
            hit = rej[any_ok]
            x_new[hit] = trials[any_ok, k_first[any_ok]]
            f_new[hit] = f_trials[any_ok, k_first[any_ok]]
            ok[hit] = True
            tries[rej] += ls_block
            alpha0[rej] *= 0.5**ls_block
            rej = rej[~any_ok]

        # gradient refresh for lanes that accepted a backtracked step
        need_g = np.nonzero(ok & ~have_grad)[0]
        if len(need_g):
            x_trial = x_new
            fg, gg = vg_at(need_g)
            n_fev[need_g] += 1
            f_new[need_g] = fg  # evaluated at exactly x_new: keeps f/g consistent
            g_new[need_g] = gg

        moved_lanes = ok & ~done

        # --- history update (curvature guard; reset-on-failure) -----------
        s_vec = x_new - x
        y_vec = g_new - g
        sy = np.einsum("rp,rp->r", s_vec, y_vec)
        good = moved_lanes & (
            sy > 1e-10 * np.linalg.norm(s_vec, axis=-1) * np.linalg.norm(y_vec, axis=-1)
        )
        w = good & ~done
        s_hist[head[w], r_idx[w]] = s_vec[w]
        y_hist[head[w], r_idx[w]] = y_vec[w]
        rho[head[w], r_idx[w]] = 1.0 / sy[w]
        head = np.where(w, (head + 1) % m, head)
        count = np.where(w, np.minimum(count + 1, m), count)

        failed = ~ok & ~done
        reset = failed & (count > 0)
        head = np.where(reset, 0, head)
        count = np.where(reset, 0, count)
        failed_for_good = failed & ~reset

        # --- stall stop: accepted steps with below-slack progress ---------
        if stall_iters > 0:
            progressed = (f - f_new) > f_slack
            stall = np.where(moved_lanes & ~progressed, stall + 1, 0).astype(np.int32)

        iters += np.where(~done, 1, 0).astype(np.int32)
        x, f, g = x_new, f_new, g_new
        done = done | failed_for_good | (pg_norm(x, g) <= tol)
        if stall_iters > 0:
            done = done | (stall >= stall_iters)
        if progress is not None:
            progress(it, done)

    return HostLBFGSResult(
        x=x,
        f=f,
        g=g,
        iters=iters,
        n_fev=n_fev,
        converged=pg_norm(x, g) <= tol,
    )


def make_stage_optimizer_host(
    nll: Callable,
    q_sqrt,
    max_iter: int = 200,
    tol: float = 1e-4,
    history: int = 10,
    ls_block: int = 5,
    dtype=None,
):
    """Drop-in replacement for ``estimate.make_stage_optimizer`` running the
    optimizer loop on the host: ``stage(p0_norm [R, P], gamma) ->
    HostLBFGSResult``. Device programs are loop-free (vmapped NLL(+grad)).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def vg_batched(p, gamma):
        vg = jax.value_and_grad(lambda q: nll(q, q_sqrt, jnp.sqrt(gamma)))
        return jax.vmap(vg)(p)

    @jax.jit
    def f_batched_k(p_rk, gamma):
        fun = lambda q: nll(q, q_sqrt, jnp.sqrt(gamma))
        return jax.vmap(jax.vmap(fun))(p_rk)

    def stage(p0_norm, gamma):
        dt = dtype or jnp.asarray(p0_norm).dtype
        gamma_j = jnp.asarray(gamma, dt)
        f32 = jnp.dtype(dt) == jnp.dtype(jnp.float32)

        def vagb(x):
            return vg_batched(jnp.asarray(x, dt), gamma_j)

        def vbk(x_rk):
            return f_batched_k(jnp.asarray(x_rk, dt), gamma_j)

        return lbfgs_box_host(
            vagb,
            vbk,
            np.asarray(p0_norm, np.float64),
            max_iter=max_iter,
            tol=tol,
            history=history,
            ls_block=ls_block,
            f32=f32,
        )

    return stage
