"""Fused Pallas TPU kernel for the explicit-path sqrt-EKF NLL (+ gradient).

The explicit estimation hot loop (uniform observations, ERK solver,
``disable_cov_update=True``) spends its time in thousands of tiny-state
filter steps. The XLA path (inference/nll.py fast path) already fuses well
forward, but its backward pass materializes per-step residual stacks whose
(n, n) minor dims pad up to 64x in HBM tiles — sqrt(T) checkpointing made
that tractable (36.5M steps/s at batch 8192 on v5e), with ~3x left to the
per-step-checkpointed predict bound (docs/DESIGN.md §4).

This module closes that gap with a hand-scheduled kernel:

  * **layout**: the restart batch occupies the full (8, 128) VPU tile; every
    per-chain scalar (state components, covariance entries, the running NLL)
    is one ``[8, 128]`` tile, and all small-matrix algebra (Householder QR,
    triangular solves, gain products) is unrolled in Python over lists of
    tiles — zero padding, zero layout surprises, pure VPU arithmetic.
  * **forward**: one ``pallas_call`` scans all observation intervals with
    the carry in VMEM/registers; HBM sees only the parameter tiles in and
    one NLL tile out.
  * **backward** (``jax.custom_vjp``): a second kernel recomputes the
    forward storing one state snapshot per observation interval in VMEM
    scratch, then walks the intervals in reverse, applying ``jax.vjp`` of
    the (unrolled, loop-free) interval body entirely on-chip. No residual
    stack ever touches HBM.

Reference parity: the math is the square-root EKF NLL of
/root/reference/scripts/run_parameter_estimation.py:685-796 with the
QR-sum covariance updates of /root/reference/src/utils.py:233-274 and the
solver stage arithmetic of /root/reference/src/solvers/rksolver.py:105-194;
numerics match inference/nll.py's fast path (see tests/test_pallas_ekf.py).

Scope (asserted at build time): ERK solver, uniform observation grid,
``disable_cov_update=True``, scalar model parameters, a model with a
registered tile-RHS below. Anything else falls back to the XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L

# Snapshot buffers above this spill from VMEM scratch to an HBM buffer
# reached via DMA (tests lower it to force the HBM path on small problems).
_VMEM_SNAP_LIMIT = 6 * 1024 * 1024

# Mosaic's default *scoped*-VMEM budget is 16 MiB; the implicit (SDIRK)
# backward kernel's on-chip jax.vjp of a d-step Newton interval needs ~24 MiB
# of compiler scratch (measured: round-5 HH probe died at 23.52M vs 16.00M).
# v5e has 128 MiB of VMEM per core — raise the cap; codegen for kernels that
# fit the default (the explicit/LV family) is unchanged.
_SCOPED_VMEM_LIMIT = 96 * 1024 * 1024

_EPS_GUARD = lambda dtype: (4.0 * jnp.finfo(dtype).eps) ** 2


# --------------------------------------------------------------------------
# Tile RHS registry: per-model flat right-hand sides on lists of [8, 128]
# tiles (y[i] is flat state component i). Mirrors models/classic.py; the
# covariance pushforward differentiates these with jax.jvp, so they must be
# pure elementwise jnp arithmetic.
# --------------------------------------------------------------------------

def _rhs_lotka_volterra(t, y, p):
    prey, pred = y
    return [
        p["alpha"] * prey - p["beta"] * prey * pred,
        p["delta"] * prey * pred - p["gamma"] * pred,
    ]


def _rhs_lorenz(t, y, p):
    a, b, c = y
    return [
        p["sigma"] * (b - a),
        a * (p["rho"] - c) - b,
        a * b - p["beta"] * c,
    ]


def _rhs_van_der_pol(t, y, p):
    pos, vel = y
    return [vel, p["damping"] * (1.0 - pos * pos) * vel - pos]


def _rhs_pendulum(t, y, p):
    pos, vel = y
    return [vel, -9.81 / p["length"] * jnp.sin(pos)]


def _rhs_logistic(t, y, p):
    (x,) = y
    return [p["growth_rate"] * x * (1.0 - x / p["carrying_capacity"])]


def _rhs_exponential(t, y, p):
    (x,) = y
    return [p["growth_factor"] * x]


def _make_rhs_hodgkin_huxley(variant):
    """Flat tile RHS for the single-compartment HH variants; reuses the
    model module's vectorized rate helpers (models/hodgkin_huxley.py:52-121)
    verbatim on tiles, so kinetics parity is by construction."""
    import importlib

    # the models package re-exports a same-named factory function that
    # shadows the submodule attribute; resolve the module explicitly
    hh = importlib.import_module("ode_uncertainty_tpu.models.hodgkin_huxley")

    dim = {"full": 8, "reduced-1": 7, "reduced-4": 4}[variant]

    def rhs(t, y, p):
        v = y[0]
        v_t = p["V_T"]

        def gate(a, b, g):
            return a * (1.0 - g) - b * g

        dm = gate(hh.alpha_m(v, v_t), hh.beta_m(v, v_t), y[1])
        dh = gate(hh.alpha_h(v, v_t), hh.beta_h(v, v_t), y[2])
        dn = gate(hh.alpha_n(v, v_t), hh.beta_n(v, v_t), y[3])
        i_na = p["g_Na"] * y[1] ** 3 * y[2] * (p["E_Na"] - v)
        i_k = p["g_K"] * y[3] ** 4 * (p["E_K"] - v)
        i_leak = p["g_leak"] * (p["E_leak"] - v)
        total = i_na + i_k + i_leak
        derivs = [dm, dh, dn]
        if dim >= 7:
            dp = (hh.p_inf(v) - y[4]) / hh.tau_p(v, p["tau_max"])
            dq = gate(hh.alpha_q(v), hh.beta_q(v), y[5])
            dr = gate(hh.alpha_r(v), hh.beta_r(v), y[6])
            derivs += [dp, dq, dr]
            total = total + p["g_M"] * y[4] * (p["E_K"] - v)
            total = total + p["g_L"] * y[5] ** 2 * y[6] * (p["E_Ca"] - v)
        if dim == 8:
            du = (hh.u_inf(v, p["V_x"]) - y[7]) / hh.tau_u(v, p["V_x"])
            derivs.append(du)
            total = total + (
                p["g_T"] * hh.s_inf(v, p["V_x"]) ** 2 * y[7] * (p["E_Ca"] - v)
            )
        dv = (total + hh.input_current(t) / p["A"]) / p["C"]
        return [dv] + derivs

    return rhs


TILE_RHS = {
    "lotka_volterra": _rhs_lotka_volterra,
    "lorenz": _rhs_lorenz,
    "van_der_pol": _rhs_van_der_pol,
    "pendulum": _rhs_pendulum,
    "logistic": _rhs_logistic,
    "exponential": _rhs_exponential,
    "hodgkin_huxley_full": _make_rhs_hodgkin_huxley("full"),
    "hodgkin_huxley_reduced-1": _make_rhs_hodgkin_huxley("reduced-1"),
    "hodgkin_huxley_reduced-4": _make_rhs_hodgkin_huxley("reduced-4"),
}


# --------------------------------------------------------------------------
# Tile linear algebra (lists of tiles; all python loops unroll at trace time)
# --------------------------------------------------------------------------

def _erk_step_tiles(tile_rhs, tab, h, t, y, params):
    """One explicit embedded-RK step on flat tile lists (solvers/erk.py:56-71
    transliterated; structural zeros skipped identically)."""
    n = len(y)
    ks = []
    for i in range(tab.num_stages):
        if i == 0:
            yi = y
        else:
            yi = list(y)
            for j_st in range(i):
                a = tab.a[i][j_st]
                if a == 0.0:
                    continue
                yi = [yi_k + (h * a) * ks[j_st][k] for k, yi_k in enumerate(yi)]
        ks.append(tile_rhs(t + tab.c[i] * h, yi, params))
    x_next = list(y)
    for i, b in enumerate(tab.b_sol):
        if b == 0.0:
            continue
        x_next = [xk + (h * b) * ks[i][k] for k, xk in enumerate(x_next)]
    return x_next


def _qr_r_tiles(a_rows):
    """R factor of a thin QR for an [m][n] list-of-tiles matrix; exact
    transliteration of ops/small_qr.py:qr_r_small (scale-equivariant
    Householder sweep with the f32 zero-column guard)."""
    m, n = len(a_rows), len(a_rows[0])
    dtype = a_rows[0][0].dtype
    eps = _EPS_GUARD(dtype)

    scale = abs(a_rows[0][0])
    for i in range(m):
        for j in range(n):
            if i or j:
                scale = jnp.maximum(scale, jnp.abs(a_rows[i][j]))
    scale = jnp.where(scale > 0.0, scale, 1.0)
    r = [[a_rows[i][j] / scale for j in range(n)] for i in range(m)]

    for j in range(n):
        col = [r[i][j] for i in range(j, m)]
        sigma_sq = col[0] * col[0]
        for c in col[1:]:
            sigma_sq = sigma_sq + c * c
        sigma = jnp.sqrt(sigma_sq)
        sign = jnp.where(col[0] >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sign * sigma
        v = [col[0] + sigma * sign] + col[1:]
        vnorm_sq = v[0] * v[0]
        for c in v[1:]:
            vnorm_sq = vnorm_sq + c * c
        inv = jnp.where(vnorm_sq > eps, 2.0 / jnp.maximum(vnorm_sq, eps), 0.0)

        for k in range(j + 1, n):
            coeff = v[0] * r[j][k]
            for i in range(j + 1, m):
                coeff = coeff + v[i - j] * r[i][k]
            coeff = coeff * inv
            for i in range(j, m):
                r[i][k] = r[i][k] - v[i - j] * coeff
        r[j][j] = jnp.where(vnorm_sq > eps, alpha, col[0])
        for i in range(j + 1, m):
            r[i][j] = jnp.zeros_like(r[i][j])

    return [[r[i][j] * scale for j in range(n)] for i in range(n)]


def _sqrt_sum_tiles(*factors):
    """Lower-triangular L (as [n][n] tiles) with L L^T = sum F F^T; mirrors
    ops/sqrt_linalg.py:sqrt_sum (stack transposes, QR, transpose back).
    Each factor is [n][k] tiles (columns may differ)."""
    n = len(factors[0])
    rows = []
    for f in factors:
        k = len(f[0])
        for c in range(k):
            rows.append([f[i][c] for i in range(n)])  # row c of F^T
    r = _qr_r_tiles(rows)
    return [[r[j][i] for j in range(n)] for i in range(n)]  # transpose


def _fwd_sub_tiles(lmat, b):
    """Solves L z = b (L lower [n][n] tiles, b [n] tiles) by forward
    substitution (cho_solve's first leg, ops/sqrt_linalg.py:112-116)."""
    n = len(b)
    z = []
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - lmat[i][j] * z[j]
        z.append(acc / lmat[i][i])
    return z


def _gj_inv_tiles(a):
    """Pivot-free Gauss-Jordan inverse of an [n][n] list-of-tiles matrix
    (ops/small_inv.py:28-46 transliterated; only ever applied to the
    diagonally-dominant simplified-Newton matrix I - h*gamma*J)."""
    n = len(a)
    m = [[a[i][j] for j in range(n)] + [
        jnp.ones_like(a[0][0]) if i == j else jnp.zeros_like(a[0][0])
        for j in range(n)
    ] for i in range(n)]
    for j in range(n):
        pivot = m[j][j]
        row = [m[j][k] / pivot for k in range(2 * n)]
        for i in range(n):
            if i == j:
                continue
            col = m[i][j]
            m[i] = [m[i][k] - col * row[k] for k in range(2 * n)]
        m[j] = row
    return [[m[i][n + j] for j in range(n)] for i in range(n)]


def _matvec_tiles(a, v):
    return [sum(a[i][j] * v[j] for j in range(len(v))) for i in range(len(a))]


def _make_sdirk_step_tiles(tile_rhs, h, newton_iters, n):
    """Kvaerno3 ESDIRK step on flat tile lists (solvers/sdirk.py:96-148
    transliterated): one base-point Jacobian + Gauss-Jordan inverse drives
    fixed-iteration simplified Newton; the stage solves carry a custom_jvp
    implicit-function rule so the in-kernel vjp reuses one inverse at each
    stage solution instead of differentiating the Newton loop."""
    from ode_uncertainty_tpu.solvers.sdirk import _A, _B_ERR, _B_SOL, _C, _GAMMA

    h_gamma = h * _GAMMA

    @jax.custom_jvp
    def stage_solve(t_i, known, p, z0, minv):
        def body(_, z):
            f = tile_rhs(t_i, z, p)
            r = [z[i] - known[i] - h_gamma * f[i] for i in range(n)]
            upd = _matvec_tiles(minv, r)
            return [z[i] - upd[i] for i in range(n)]

        return jax.lax.fori_loop(0, newton_iters, body, list(z0))

    @stage_solve.defjvp
    def stage_solve_jvp(primals, tangents):
        t_i, known, p, z0, minv = primals
        dt_i, dknown, dp, _, _ = tangents
        z = stage_solve(t_i, known, p, z0, minv)
        # Jacobian at the solution, column by column through the tile RHS
        jac_cols = []
        for j in range(n):
            tan = [jnp.ones_like(z[0]) if i == j else jnp.zeros_like(z[0]) for i in range(n)]
            _, col = jax.jvp(lambda zz: tile_rhs(t_i, zz, p), (z,), (tan,))
            jac_cols.append(col)
        m_sol = [[
            (1.0 if i == j else 0.0) - h_gamma * jac_cols[j][i] for j in range(n)
        ] for i in range(n)]
        minv_sol = _gj_inv_tiles(m_sol)

        def g(ti_, known_, p_):
            f = tile_rhs(ti_, z, p_)
            return [known_[i] + h_gamma * f[i] for i in range(n)]

        _, dg = jax.jvp(g, (t_i, known, p), (dt_i, dknown, dp))
        return z, _matvec_tiles(minv_sol, dg)

    def step(t, y, params):
        f0 = tile_rhs(t, y, params)
        # base-point Jacobian + inverse (iteration accelerant only)
        jac_cols = []
        for j in range(n):
            tan = [jnp.ones_like(y[0]) if i == j else jnp.zeros_like(y[0]) for i in range(n)]
            _, col = jax.jvp(lambda zz: tile_rhs(t, zz, params), (y,), (tan,))
            jac_cols.append(col)
        m0 = [[
            (1.0 if i == j else 0.0) - h_gamma * jac_cols[j][i] for j in range(n)
        ] for i in range(n)]
        minv0 = jax.lax.stop_gradient(_gj_inv_tiles(m0))

        ks = [f0]
        for i in range(1, 4):
            t_i = t + _C[i] * h
            known = list(y)
            for j in range(i):
                if _A[i][j] != 0.0:
                    known = [known[k] + (h * _A[i][j]) * ks[j][k] for k in range(n)]
            z0 = [known[k] + h_gamma * ks[i - 1][k] for k in range(n)]
            z = stage_solve(t_i, known, params, z0, minv0)
            ks.append(tile_rhs(t_i, z, params))

        x_next = list(y)
        for i in range(4):
            if _B_SOL[i] != 0.0:
                x_next = [x_next[k] + (h * _B_SOL[i]) * ks[i][k] for k in range(n)]
        return x_next

    return step


def _bwd_sub_tiles(lmat, b):
    """Solves L^T z = b by backward substitution."""
    n = len(b)
    z = [None] * n
    for i in reversed(range(n)):
        acc = b[i]
        for j in range(i + 1, n):
            acc = acc - lmat[j][i] * z[j]
        z[i] = acc / lmat[i][i]
    return z


# --------------------------------------------------------------------------
# Builder
# --------------------------------------------------------------------------

def supports(model, solver, ekf, obs, fast_path: bool = True) -> bool:
    """Whether the fused kernel covers this configuration."""
    from ode_uncertainty_tpu.filters.sqrt_ekf import SqrtEKF
    from ode_uncertainty_tpu.solvers.erk import ERK
    from ode_uncertainty_tpu.solvers.sdirk import Kvaerno3

    return (
        isinstance(solver, (ERK, Kvaerno3))
        and model.name in TILE_RHS
        # exact type: a GMMSqrtEKF (or any other subclass/wrapper) computes
        # a different likelihood — silently evaluating the single-component
        # SqrtEKF NLL for it would be wrong, not just unsupported
        and type(ekf) is SqrtEKF
        and getattr(ekf, "disable_cov_update", False)
        and _detect_uniform(obs) is not None
    )


def _detect_uniform(obs):
    """(first, d, n_obs) for uniformly spaced sequential observations
    (same detection as inference/nll.py:71-81)."""
    flags_np = np.asarray(obs.flags)
    obs_steps = np.nonzero(flags_np)[0]
    if len(obs_steps) < 2:
        return None
    diffs = np.diff(obs_steps)
    rows = np.asarray(obs.index_map)[obs_steps]
    if np.all(diffs == diffs[0]) and np.array_equal(rows, np.arange(len(obs_steps))):
        return (int(obs_steps[0]), int(diffs[0]), len(obs_steps))
    return None


class _ChainMath:
    """The per-chain tile math shared by the fused kernels and the plain-XLA
    debug/CI evaluator: interval body, initial state, and the static layout
    metadata (observation grid, parameter offsets, constants)."""

    def __init__(self, interval, init_state, **meta):
        self.interval = interval
        self.init_state = init_state
        for k, v in meta.items():
            setattr(self, k, v)


def _build_chain_math(model, solver, spec, obs, state0, q_sqrt) -> _ChainMath:
    uniform = _detect_uniform(obs)
    assert uniform is not None, "pallas NLL needs a uniform observation grid"
    first, d, n_obs = uniform
    assert model.name in TILE_RHS, f"no tile RHS for model {model.name!r}"

    from ode_uncertainty_tpu.solvers.erk import ERK
    from ode_uncertainty_tpu.solvers.sdirk import Kvaerno3

    tile_rhs = TILE_RHS[model.name]
    h = float(solver.h)
    dtype = state0.x.dtype
    n = int(state0.x.size)
    L = int(obs.obs_dim)
    t0 = float(state0.t)

    if isinstance(solver, ERK):
        tab = solver.tableau

        def step_tiles(t, y, params):
            return _erk_step_tiles(tile_rhs, tab, h, t, y, params)

    elif isinstance(solver, Kvaerno3):
        step_tiles = _make_sdirk_step_tiles(tile_rhs, h, solver.newton_iters, n)
    else:
        raise TypeError(f"unsupported solver for pallas NLL: {solver!r}")

    # All closed-over constants as nested python floats: python scalars are
    # weakly typed, so products stay in the kernel dtype under x64 mode
    # (numpy scalars would silently promote f32 tiles to f64).
    x0_flat = np.asarray(state0.x, np.float64).reshape(n).tolist()
    p0_np = np.asarray(state0.P_sqrt, np.float64).tolist()
    h_np = np.asarray(obs.H, np.float64).tolist()  # [L][n]
    r_np = np.asarray(obs.R_sqrt, np.float64).tolist()  # [L][L]
    q_np = np.asarray(q_sqrt, np.float64).tolist()  # [n][n]

    # flat parameter layout (sorted keys; scalars only)
    offsets = {}
    off = 0
    for key, shape in zip(spec.keys, spec.shapes):
        size = int(np.prod(shape)) if shape else 1
        assert size == 1, f"vector parameter {key!r} unsupported in pallas NLL"
        offsets[key] = off
        off += size
    k_params = off

    log2pi = float(np.log(2.0 * np.pi))

    # ---------------- per-chain tile math --------------------------------

    def _params_dict(p_rows):
        return {key: p_rows[offsets[key]] for key in spec.keys}

    def _predict(t, x, p_mat, params, gamma_sqrt):
        """One EKF predict on tiles (filters/sqrt_ekf.py:88-127, QR-sum
        with the tempering noise block; local-error update disabled)."""

        def step_fn(x_list):
            return step_tiles(t, x_list, params)

        x_next, f_lin = jax.linearize(step_fn, x)
        cols = []  # cols[j][i] = (J P)_{ij}
        for j in range(n):
            cols.append(f_lin([p_mat[i][j] for i in range(n)]))
        p_pred = [[cols[j][i] for j in range(n)] for i in range(n)]
        qg = [
            [jnp.broadcast_to(jnp.asarray(0.0, dtype), x[0].shape) + gamma_sqrt * q_np[i][j]
             for j in range(n)]
            for i in range(n)
        ]
        p_new = _sqrt_sum_tiles(p_pred, qg)
        return t + h, x_next, p_new

    def _correct(x, p_mat, y_vals):
        """Joseph-form sqrt correction + innovation NLL on tiles
        (filters/sqrt_ekf.py:158-191, ops/sqrt_linalg.py:54-72). H/R are
        compile-time constants, so their products unroll to literal
        multiply-adds."""
        y_hat = []
        for l in range(L):
            acc = None
            for k in range(n):
                c = h_np[l][k]
                if c == 0.0:
                    continue
                term = c * x[k]
                acc = term if acc is None else acc + term
            y_hat.append(acc if acc is not None else jnp.zeros_like(x[0]))

        hp = [
            [sum(h_np[l][k] * p_mat[k][c] for k in range(n) if h_np[l][k] != 0.0)
             for c in range(n)]
            for l in range(L)
        ]
        r_const = [
            [jnp.broadcast_to(jnp.asarray(r_np[i][j], dtype), x[0].shape) for j in range(L)]
            for i in range(L)
        ]
        s_sqrt = _sqrt_sum_tiles(hp, r_const)

        # K = (S^-T S^-1 H P P^T)^T : two substitutions + unrolled products
        z_rows = [
            _bwd_sub_tiles(s_sqrt, _fwd_sub_tiles(s_sqrt, [
                jnp.broadcast_to(jnp.asarray(h_np[l][k], dtype), x[0].shape)
                for l in range(L)
            ]))
            for k in range(n)
        ]  # z_rows[k][l] = (S^-T S^-1 H)_{lk}
        # W = Z @ P  with Z[l][k] = z_rows[k][l]:   W[l][c] = sum_k Z[l][k] P[k][c]
        w = [
            [sum(z_rows[k][l] * p_mat[k][c] for k in range(n)) for c in range(n)]
            for l in range(L)
        ]
        # K[i][l] = sum_c W[l][c] P[i][c]   (P P^T contraction)
        k_gain = [
            [sum(w[l][c] * p_mat[i][c] for c in range(n)) for l in range(L)]
            for i in range(n)
        ]

        innov = [y_vals[l] - y_hat[l] for l in range(L)]
        x_new = [x[i] + sum(k_gain[i][l] * innov[l] for l in range(L)) for i in range(n)]

        # A = I - K H;  P_new = sqrt_sum(A P, K R)
        a_mat = [
            [
                (1.0 if i == j else 0.0)
                - sum(k_gain[i][l] * h_np[l][j] for l in range(L) if h_np[l][j] != 0.0)
                for j in range(n)
            ]
            for i in range(n)
        ]
        ap = [
            [sum(a_mat[i][k] * p_mat[k][c] for k in range(n)) for c in range(n)]
            for i in range(n)
        ]
        kr = []
        for i in range(n):
            row = []
            for c in range(L):
                acc = jnp.zeros_like(x[0])
                for l in range(L):
                    if r_np[l][c] != 0.0:
                        acc = acc + k_gain[i][l] * r_np[l][c]
                row.append(acc)
            kr.append(row)
        p_new = _sqrt_sum_tiles(ap, kr)

        # innovation NLL (ops/sqrt_linalg.py:54-72)
        z = _fwd_sub_tiles(s_sqrt, innov)
        half_maha = 0.5 * sum(zi * zi for zi in z)
        log_det = sum(jnp.log(jnp.abs(s_sqrt[l][l])) for l in range(L))
        nlg = half_maha + 0.5 * L * log2pi + log_det
        return x_new, p_new, nlg

    def _interval(x, p_mat, p_rows, gamma_sqrt, y_vals, t_start, count):
        """``count`` predicts followed by one correct; the unit the backward
        pass checkpoints (same boundary as inference/nll.py:154-162).

        ``count`` is a static python int (uniform-grid d, or first+1), so
        the predict span is python-unrolled: the bwd kernel calls
        ``jax.vjp`` over this function, and a flat op chain is the only
        form Mosaic can transpose in-kernel (a lax loop here leaves a
        scan-transpose in the jaxpr, which fails Mosaic lowering; a float
        time carry additionally trips "not a fori_loop index"). The outer
        per-interval loop stays a ``fori_loop``, so trace size is O(d) per
        kernel, not O(T).
        """
        params = _params_dict(p_rows)
        t_base = jnp.asarray(t_start, dtype)
        for i in range(count):
            _, x, p_mat = _predict(
                t_base + float(i) * h, x, p_mat, params, gamma_sqrt
            )
        x, p_mat, nlg = _correct(x, p_mat, y_vals)
        return x, p_mat, nlg

    def _init_state():
        x = [jnp.full((TILE_S, TILE_L), float(x0_flat[i]), dtype) for i in range(n)]
        p_mat = [
            [jnp.full((TILE_S, TILE_L), float(p0_np[i][j]), dtype) for j in range(n)]
            for i in range(n)
        ]
        return x, p_mat

    return _ChainMath(
        _interval, _init_state,
        first=first, d=d, n_obs=n_obs, n=n, L=L, h=h, t0=t0, dtype=dtype,
        k_params=k_params, offsets=offsets,
    )


def make_nll_tiles(
    model, solver, ekf, spec, obs, state0, num_steps: int, q_sqrt
) -> Callable:
    """Plain-XLA evaluation of the exact tile math the fused kernels run —
    ``nll_b(p_norm_b [B <= 1024, P_opt], gamma_sqrt []) -> [B]`` with
    gradients via ordinary XLA autodiff (no ``pallas_call``, no custom VJP).

    Exists for CI: on single-core CPU hosts, compiling the hand-scheduled
    kernels in interpreter mode is impractical (the backward kernel's
    recompute+vjp structure defeats XLA:CPU fusion into thousands of
    per-fusion LLVM codegen invocations, ~0.3 s each). This evaluator runs
    the identical interval body as a regular XLA program, which fuses and
    compiles in seconds, so the tile transliteration of the filter math
    (tests/test_pallas_ekf.py) stays covered on every run; the kernels
    themselves are cross-checked on real TPU (scripts/tpu_probe_r3.py) and
    by the ODEUQ_SLOW_TESTS-gated interpreter tests.
    """
    assert getattr(ekf, "disable_cov_update", False)
    cm = _build_chain_math(model, solver, spec, obs, state0, q_sqrt)
    dtype = cm.dtype
    ys_np = np.asarray(obs.ys, dtype)
    assert ys_np.shape[0] >= cm.n_obs

    @jax.jit
    def _nll_tile(p_tiles, gamma_sqrt):
        p_rows = [p_tiles[k] for k in range(cm.k_params)]
        y = lambda j: [jnp.asarray(ys_np[j, l], dtype) for l in range(cm.L)]
        x, p_mat = cm.init_state()
        x, p_mat, nll = cm.interval(
            x, p_mat, p_rows, gamma_sqrt, y(0), cm.t0, cm.first + 1
        )
        for j in range(1, cm.n_obs):
            t_start = cm.t0 + (cm.first + 1 + (j - 1) * cm.d) * cm.h
            x, p_mat, nlg = cm.interval(
                x, p_mat, p_rows, gamma_sqrt, y(j), t_start, cm.d
            )
            nll = nll + nlg
        return nll

    def nll_b(p_norm_b, gamma_sqrt):
        b = p_norm_b.shape[0]
        assert b <= TILE, "debug evaluator covers a single tile"
        phys = jax.vmap(lambda p: spec.flatten(spec.to_params(p)))(
            p_norm_b.astype(dtype)
        ).astype(dtype)  # [B, K]
        phys = jnp.concatenate(
            [phys, jnp.broadcast_to(phys[:1], (TILE - b, cm.k_params))], axis=0
        ) if b != TILE else phys
        p_tiles = phys.T.reshape(cm.k_params, TILE_S, TILE_L)
        out = _nll_tile(p_tiles, jnp.asarray(gamma_sqrt, dtype))
        return out.reshape(TILE)[:b]

    return nll_b


def make_nll_pallas(
    model,
    solver,
    ekf,
    spec,
    obs,
    state0,
    num_steps: int,
    q_sqrt,
    interpret: bool = False,
) -> Callable:
    """Builds ``nll_b(p_norm_b [B, P_opt], gamma_sqrt []) -> [B]`` with a
    fused-Pallas forward and a custom-VJP recompute backward.

    ``q_sqrt`` [n, n] is baked in as a compile-time constant (it is fixed
    per experiment; the tempering scale ``gamma_sqrt`` stays traced).
    B must be positive; it is padded to a multiple of 1024 internally.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert getattr(ekf, "disable_cov_update", False), (
        "pallas NLL covers disable_cov_update=True only"
    )
    cm = _build_chain_math(model, solver, spec, obs, state0, q_sqrt)
    n, k_params, L, dtype = cm.n, cm.k_params, cm.L, cm.dtype
    first, d, n_obs, t0, h = cm.first, cm.d, cm.n_obs, cm.t0, cm.h
    _interval = cm.interval
    _init_state = cm.init_state
    ys_np = np.asarray(obs.ys, dtype)  # [n_obs_total, L]
    assert ys_np.shape[0] >= n_obs

    zero_tile = lambda: jnp.zeros((TILE_S, TILE_L), dtype)

    def _load_params(params_ref):
        return [params_ref[k, 0] for k in range(k_params)]

    def _load_y(ys_ref, j):
        row = ys_ref[j]  # [L]
        return [row[l] for l in range(L)]

    def _pack(x, p_mat):
        return jnp.stack(x + [p_mat[i][j] for i in range(n) for j in range(n)])

    def _unpack(arr):
        x = [arr[i] for i in range(n)]
        p_mat = [[arr[n + i * n + j] for j in range(n)] for i in range(n)]
        return x, p_mat

    def fwd_kernel(params_ref, ys_ref, gamma_ref, out_ref):
        gamma_sqrt = gamma_ref[0, 0]
        p_rows = _load_params(params_ref)
        x, p_mat = _init_state()

        x, p_mat, nll = _interval(
            x, p_mat, p_rows, gamma_sqrt, _load_y(ys_ref, 0), t0, first + 1
        )

        def body(i, carry):
            packed, nll = carry
            x, p_mat = _unpack(packed)
            j = i + 1
            t_start = t0 + (first + 1 + i * d) * h
            x, p_mat, nlg = _interval(
                x, p_mat, p_rows, gamma_sqrt, _load_y(ys_ref, j), t_start, d
            )
            return _pack(x, p_mat), nll + nlg

        _, nll = jax.lax.fori_loop(0, n_obs - 1, body, (_pack(x, p_mat), nll))
        out_ref[0] = nll

    rows_snap = n + n * n
    # One snapshot per observation interval. Small horizons keep them in a
    # VMEM scratch (direct indexing); long implicit horizons (HH-full:
    # 10^4 intervals x 72 tiles = ~2.9 GB) spill to a compiler-placed
    # (HBM) buffer reached via async DMA through a VMEM staging tile-stack.
    vmem_snap_bytes = n_obs * rows_snap * TILE * jnp.dtype(dtype).itemsize
    use_hbm_snap = vmem_snap_bytes > _VMEM_SNAP_LIMIT

    def _bwd_body(params_ref, ys_ref, gamma_ref, g_ref, dparams_ref, dgamma_ref,
                  snap_store, snap_load):
        gamma_sqrt = gamma_ref[0, 0]
        p_rows = _load_params(params_ref)
        g = g_ref[0]  # [8, 128] incoming NLL cotangent

        # phase 1: forward recompute, snapshotting each interval's entry state
        x, p_mat = _init_state()
        snap_store(0, _pack(x, p_mat))
        x, p_mat, _ = _interval(
            x, p_mat, p_rows, gamma_sqrt, _load_y(ys_ref, 0), t0, first + 1
        )

        def fwd_body(i, packed):
            x, p_mat = _unpack(packed)
            snap_store(i + 1, packed)
            t_start = t0 + (first + 1 + i * d) * h
            x, p_mat, _ = _interval(
                x, p_mat, p_rows, gamma_sqrt, _load_y(ys_ref, i + 1), t_start, d
            )
            return _pack(x, p_mat)

        jax.lax.fori_loop(0, n_obs - 1, fwd_body, _pack(x, p_mat))

        # phase 2: reverse sweep; jax.vjp of the interval body runs on-chip
        dx = [zero_tile() for _ in range(n)]
        dp_mat = [[zero_tile() for _ in range(n)] for _ in range(n)]
        dpar = [zero_tile() for _ in range(k_params)]
        dgam = jnp.zeros((), dtype)  # gamma is a shared scalar: scalar cotangent

        def rev_body(i, carry):
            packed_d, dpar, dgam = carry
            dx, dp_mat = _unpack(packed_d)
            j = n_obs - 1 - i  # observation index, n_obs-1 .. 1
            # identical expression to the forward/recompute phases: in f32,
            # t0 + (first+1)*h + (j-1)*d*h rounds differently from
            # t0 + (first+1+(j-1)*d)*h, and the VJP must linearize at the
            # exact time base the snapshotted trajectory was computed with
            t_start = t0 + (first + 1 + (j - 1) * d) * h
            y_vals = _load_y(ys_ref, j)
            x_in, p_in = _unpack(snap_load(j))

            def f(x, p_mat, p_rows, gam):
                xo, po, nlg = _interval(x, p_mat, p_rows, gam, y_vals, t_start, d)
                return xo, po, nlg

            _, vjp_fn = jax.vjp(f, x_in, p_in, p_rows, gamma_sqrt)
            ddx, ddp, ddpar, ddgam = vjp_fn((dx, dp_mat, g))
            dpar = [a + b for a, b in zip(dpar, ddpar)]
            return _pack(ddx, ddp), dpar, dgam + ddgam

        packed_d, dpar, dgam = jax.lax.fori_loop(
            0, n_obs - 1, rev_body, (_pack(dx, dp_mat), dpar, dgam)
        )
        dx, dp_mat = _unpack(packed_d)

        # interval 0 (different span length) unrolled
        x_in, p_in = _unpack(snap_load(0))
        y0 = _load_y(ys_ref, 0)

        def f0(x, p_mat, p_rows, gam):
            xo, po, nlg = _interval(x, p_mat, p_rows, gam, y0, t0, first + 1)
            return xo, po, nlg

        _, vjp_fn = jax.vjp(f0, x_in, p_in, p_rows, gamma_sqrt)
        _, _, ddpar, ddgam = vjp_fn((dx, dp_mat, g))
        dpar = [a + b for a, b in zip(dpar, ddpar)]
        dgam = dgam + ddgam

        dparams_ref[:, 0] = jnp.stack(dpar)
        # the scalar gamma cotangent rides out in one element of the tile
        # (iota mask, not .at[].set — scatter has no Mosaic TPU lowering)
        ri = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, TILE_L), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, TILE_L), 1)
        dgamma_ref[0] = jnp.where(
            (ri == 0) & (ci == 0), dgam.astype(dtype), jnp.zeros((), dtype)
        )

    if use_hbm_snap:

        def bwd_kernel(params_ref, ys_ref, gamma_ref, g_ref,
                       dparams_ref, dgamma_ref, snap_ref, stage_ref, dma_sem):
            def snap_store(j, packed):
                stage_ref[...] = packed
                cp = pltpu.make_async_copy(stage_ref, snap_ref.at[j], dma_sem)
                cp.start()
                cp.wait()

            def snap_load(j):
                cp = pltpu.make_async_copy(snap_ref.at[j], stage_ref, dma_sem)
                cp.start()
                cp.wait()
                return stage_ref[...]

            _bwd_body(params_ref, ys_ref, gamma_ref, g_ref,
                      dparams_ref, dgamma_ref, snap_store, snap_load)

    else:

        def bwd_kernel(params_ref, ys_ref, gamma_ref, g_ref,
                       dparams_ref, dgamma_ref, snap_ref):
            def snap_store(j, packed):
                snap_ref[j] = packed

            def snap_load(j):
                return snap_ref[j]

            _bwd_body(params_ref, ys_ref, gamma_ref, g_ref,
                      dparams_ref, dgamma_ref, snap_store, snap_load)

    # ---------------- pallas_call wrappers -------------------------------

    ys_const = jnp.asarray(ys_np[:n_obs], dtype)

    def _fwd_call(phys_t, gamma_sqrt):
        """phys_t: [K, G, 8, 128] -> nll [G, 8, 128]."""
        g_tiles = phys_t.shape[1]
        gamma_arr = jnp.asarray(gamma_sqrt, dtype).reshape(1, 1)
        return pl.pallas_call(
            fwd_kernel,
            grid=(g_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (k_params, 1, TILE_S, TILE_L),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((g_tiles, TILE_S, TILE_L), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_SCOPED_VMEM_LIMIT
            ),
            interpret=interpret,
        )(phys_t, ys_const, gamma_arr)

    def _bwd_call(phys_t, gamma_sqrt, g_t):
        g_tiles = phys_t.shape[1]
        gamma_arr = jnp.asarray(gamma_sqrt, dtype).reshape(1, 1)
        return pl.pallas_call(
            bwd_kernel,
            grid=(g_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (k_params, 1, TILE_S, TILE_L),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (k_params, 1, TILE_S, TILE_L),
                    lambda i: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_S, TILE_L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + ([pl.BlockSpec(memory_space=pl.ANY)] if use_hbm_snap else []),
            out_shape=[
                jax.ShapeDtypeStruct((k_params, g_tiles, TILE_S, TILE_L), dtype),
                jax.ShapeDtypeStruct((g_tiles, TILE_S, TILE_L), dtype),
            ]
            + (
                [jax.ShapeDtypeStruct((n_obs, rows_snap, TILE_S, TILE_L), dtype)]
                if use_hbm_snap
                else []
            ),
            scratch_shapes=(
                [
                    pltpu.VMEM((rows_snap, TILE_S, TILE_L), dtype),
                    pltpu.SemaphoreType.DMA(()),
                ]
                if use_hbm_snap
                else [pltpu.VMEM((n_obs, rows_snap, TILE_S, TILE_L), dtype)]
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_SCOPED_VMEM_LIMIT
            ),
            interpret=interpret,
        )(phys_t, ys_const, gamma_arr, g_t)[:2]

    @jax.custom_vjp
    def _nll_phys(phys, gamma_sqrt):  # phys [B_pad, K]
        b_pad = phys.shape[0]
        g_tiles = b_pad // TILE
        phys_t = phys.T.reshape(k_params, g_tiles, TILE_S, TILE_L)
        out = _fwd_call(phys_t, gamma_sqrt)
        return out.reshape(b_pad)

    def _nll_fwd(phys, gamma_sqrt):
        return _nll_phys(phys, gamma_sqrt), (phys, gamma_sqrt)

    def _nll_bwd(res, g):
        phys, gamma_sqrt = res
        b_pad = phys.shape[0]
        g_tiles = b_pad // TILE
        phys_t = phys.T.reshape(k_params, g_tiles, TILE_S, TILE_L)
        g_t = g.reshape(g_tiles, TILE_S, TILE_L).astype(dtype)
        dphys_t, dgam_t = _bwd_call(phys_t, gamma_sqrt, g_t)
        dphys = dphys_t.reshape(k_params, b_pad).T
        dgam = jnp.sum(dgam_t).astype(jnp.asarray(gamma_sqrt).dtype)
        return dphys, dgam

    _nll_phys.defvjp(_nll_fwd, _nll_bwd)

    def nll_b(p_norm_b, gamma_sqrt):
        """Batched NLL: [B, P_opt] normalized params -> [B]."""
        b = p_norm_b.shape[0]
        b_pad = -(-b // TILE) * TILE
        phys = jax.vmap(lambda p: spec.flatten(spec.to_params(p)))(
            p_norm_b.astype(dtype)
        ).astype(dtype)  # [B, K]
        if b_pad != b:
            phys = jnp.concatenate(
                [phys, jnp.broadcast_to(phys[:1], (b_pad - b, k_params))], axis=0
            )
        return _nll_phys(phys, gamma_sqrt)[:b]

    return nll_b
