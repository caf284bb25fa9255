"""Checkpoint/resume + progress reporting for long estimation sweeps.

The reference writes results once at the end — a killed 100-restart run
loses everything (SURVEY.md §5). Here the (restart-chunk x tempering-stage)
grid is the durable unit: after every completed unit the full result store is
written to a sidecar ``<output>.units.npz``, and a restarted run skips
completed units. Restart draws are deterministic in the seed, so the sidecar
only needs results, not RNG state.

This is also where sweep observability lives: each unit prints NLL quantiles,
optimizer-effort medians and an ETA, so hour-scale runs can be babysat
(the environment's TPU tunnel kills long-lived sessions; resume + progress
is what makes the flagship runs land).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable

import numpy as np


def unit_sidecar(output: str) -> Path:
    return Path(str(output) + ".units.npz")


def run_stage_grid(
    output: str,
    p0: np.ndarray,
    gammas: np.ndarray,
    stage_fn: Callable,
    to_physical: Callable,
    chunk: int = 512,
    resume: bool = True,
    tag: str = "",
    log: Callable[[str], None] = print,
) -> dict:
    """Runs every (restart-chunk x stage) unit of a tempered estimation sweep
    with durable per-unit checkpointing.

    Args:
        p0: [R, P] normalized initial restarts (device or host array).
        gammas: [S] tempering noise levels.
        stage_fn: ``(p_norm [r, P], gamma) -> result`` with fields
            ``x, f, iters, n_fev`` (an ``LBFGSResult``); runs one tempering
            stage for one restart chunk on device.
        to_physical: maps normalized [.., P] to physical parameter values.

    Returns a dict with the H5-schema result tensors
    (params_inits/params_optims/nll_optims/num_lbfgs_iters/num_nll_evals).
    """
    import inspect

    import jax.numpy as jnp

    stage_takes_key = "unit_key" in inspect.signature(stage_fn).parameters
    p0 = np.asarray(p0)
    r, p_dim = p0.shape
    s = int(np.shape(gammas)[0])
    ck_path = unit_sidecar(output)

    def fresh():
        return {
            # copy: p_current is updated in place per unit and must never
            # alias the caller's p0 (params_inits is derived from p0 at the end)
            "p_current": np.array(p0, np.float64),  # params after last done stage
            "stage_done": np.zeros((r, s), bool),
            "params_optims": np.full((r, s, p_dim), np.nan),
            "nll_optims": np.full((r, s), np.nan),
            "num_lbfgs_iters": np.zeros((r, s), np.int32),
            "num_nll_evals": np.zeros((r, s), np.int32),
        }

    store = fresh()
    if resume and ck_path.exists():
        with np.load(ck_path, allow_pickle=False) as z:
            if z["stage_done"].shape == (r, s):
                store = {k: z[k] for k in store}
                log(
                    f"[{tag}] resuming: "
                    f"{int(store['stage_done'].all(axis=1).sum())}/{r} restarts complete"
                )

    units = [
        (start, min(start + chunk, r), si)
        for start in range(0, r, chunk)
        for si in range(s)
    ]
    todo = [u for u in units if not store["stage_done"][u[0] : u[1], u[2]].all()]
    n_done_prior = len(units) - len(todo)
    unit_times: list[float] = []
    dtype = jnp.asarray(p0).dtype

    for k, (start, stop, si) in enumerate(todo):
        t0 = time.perf_counter()
        p_in = jnp.asarray(store["p_current"][start:stop], dtype)
        kw = {"unit_key": f"r{start}-{stop}-s{si}"} if stage_takes_key else {}
        # Flushed start marker: on the remote TPU the first dispatch of a
        # unit can be silent for many minutes (compile + cold line search);
        # babysitter watchdogs need evidence the unit began.
        print(
            f"[{tag}] starting unit {n_done_prior + k + 1}/{len(units)} "
            f"(restarts {start}:{stop}, stage {si + 1}/{s})",
            flush=True,
        )
        res = stage_fn(p_in, gammas[si], **kw)
        elapsed = time.perf_counter() - t0
        unit_times.append(elapsed)

        store["p_current"][start:stop] = np.asarray(res.x, np.float64)
        store["params_optims"][start:stop, si] = np.asarray(to_physical(res.x))
        store["nll_optims"][start:stop, si] = np.asarray(res.f)
        store["num_lbfgs_iters"][start:stop, si] = np.asarray(res.iters)
        store["num_nll_evals"][start:stop, si] = np.asarray(res.n_fev)
        store["stage_done"][start:stop, si] = True
        ck_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(ck_path, **store)

        f = store["nll_optims"][start:stop, si]
        finite = f[np.isfinite(f)]
        q = (
            np.percentile(finite, [10, 50, 90])
            if finite.size
            else np.full(3, np.nan)
        )
        # steady-state ETA: ignore the compile-tainted first unit when possible
        steady = unit_times[1:] if len(unit_times) > 1 else unit_times
        eta = float(np.mean(steady)) * (len(todo) - k - 1)
        log(
            f"[{tag}] unit {n_done_prior + k + 1}/{len(units)} "
            f"(restarts {start}:{stop}, stage {si + 1}/{s}, "
            f"gamma={float(gammas[si]):.3g}): {elapsed:.1f}s  "
            f"nll q10/50/90 = {q[0]:.3g}/{q[1]:.3g}/{q[2]:.3g}  "
            f"iters med={int(np.median(store['num_lbfgs_iters'][start:stop, si]))}  "
            f"ETA {eta / 60:.1f}m"
        )

    ck_path.unlink(missing_ok=True)
    return {
        "params_inits": np.asarray(to_physical(jnp.asarray(p0, dtype))),
        "params_optims": store["params_optims"],
        "nll_optims": store["nll_optims"],
        "num_lbfgs_iters": store["num_lbfgs_iters"],
        "num_nll_evals": store["num_nll_evals"],
    }
