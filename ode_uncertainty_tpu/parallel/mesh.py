"""Device-mesh scale-out for the estimation workload.

The problem's parallel structure is embarrassing parallelism over
(restarts x tempering chains x particles) of *small* per-chain states
(SURVEY.md §2.8): there is deliberately no tensor/pipeline axis. Scaling
therefore means laying the restart axis over ICI: a 1-D mesh, restart-sharded
inputs, and XLA partitions the vmapped program with zero collectives in the
hot loop (only the final result gather rides ICI).

The reference's analog is a host process pool with pickled results
(scripts/run_parameter_estimation.py:266-272); here the same axis is a
``NamedSharding`` over a ``jax.sharding.Mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RESTART_AXIS = "restarts"


def device_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the restart axis."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (RESTART_AXIS,))


def restart_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the restart batch."""
    return NamedSharding(mesh, P(RESTART_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_restarts(tree, mesh: Mesh):
    """Places a pytree of [R, ...] arrays restart-sharded on the mesh."""
    return jax.device_put(tree, restart_sharding(mesh))


def make_sharded_tempered_estimator(
    nll,
    spec,
    q_sqrt,
    mesh: Mesh,
    max_iter: int = 200,
    tol: float = 1e-6,
    history: int = 10,
):
    """Mesh-sharded variant of
    :func:`ode_uncertainty_tpu.inference.estimate.make_tempered_estimator`.

    Inputs/outputs with a leading restart axis are sharded over the mesh;
    gammas and all closed-over data are replicated. The per-restart L-BFGS
    while-loops are fully local to a device — no collectives inside the
    optimization; wall-clock scales ~1/n_devices for R >> n_devices.

    .. warning:: **Correctness demo, not the production scale-out path.**
        XLA turns the vmapped while-loop's termination test into a global
        reduction across the sharded batch, so every device steps until the
        *slowest* lane anywhere finishes — measured 5.7x partition overhead
        at 8 devices (docs/DESIGN.md §9b) — and the remote-TPU runtime used
        here kernel-faults on this program shape at any useful width. The
        production multi-chip path is the mesh-sharded host strong-Wolfe
        optimizer (``inference.lbfgs_host.make_stage_optimizer_host`` with
        ``mesh=...``): loop-free device programs, measured partition
        overhead ~1.0, stall-stop and bucket compaction included.
    """
    from ode_uncertainty_tpu.inference.estimate import EstimationResult
    from ode_uncertainty_tpu.inference.lbfgs import lbfgs_box

    import jax.numpy as jnp

    def run_one(p0_norm, gammas):
        def stage(p, gamma):
            res = lbfgs_box(
                lambda q: nll(q, q_sqrt, jnp.sqrt(gamma)),
                p,
                0.0,
                1.0,
                max_iter=max_iter,
                tol=tol,
                history=history,
            )
            return res.x, (res.x, res.f, res.iters, res.n_fev)

        _, (xs, fs, iters, fevs) = lax.scan(stage, p0_norm, gammas)
        return xs, fs, iters, fevs

    rs = restart_sharding(mesh)
    rep = replicated(mesh)

    @partial_jit_with_shardings(rs, rep)
    def estimate(p0_norm, gammas):
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


def make_sharded_nll_landscape(nll, q_sqrt, mesh: Mesh):
    """Mesh-sharded variant of
    :func:`ode_uncertainty_tpu.inference.nll.make_nll_landscape`:
    ``run(grid [G, P], gammas [S]) -> [S, G]`` with the grid axis laid over
    the mesh (G must be a multiple of the mesh size — pad with a repeated
    row and discard). Each device evaluates its grid shard for every
    tempering stage; no collectives until the final gather.

    Reference analog: the process-pool parameter sweep of
    run_parameter_estimation.py evaluate (scripts/run_parameter_estimation.py:
    266-272), one grid point per worker.
    """
    import jax.numpy as jnp

    rs = restart_sharding(mesh)
    rep = replicated(mesh)
    out_sh = NamedSharding(mesh, P(None, RESTART_AXIS))

    def _scan_gammas(grid, gammas):
        def one_gamma(carry, gamma):
            vals = jax.vmap(lambda p: nll(p, q_sqrt, jnp.sqrt(gamma)))(grid)
            return carry, vals

        _, rows = lax.scan(one_gamma, None, gammas)
        return rows

    return jax.jit(_scan_gammas, in_shardings=(rs, rep), out_shardings=out_sh)


def partial_jit_with_shardings(restart_shard, rep):
    """jit decorator: first arg restart-sharded, second replicated; outputs
    restart-sharded on their leading axis except the gamma vector."""

    def deco(fn):
        from ode_uncertainty_tpu.inference.estimate import EstimationResult

        out_shardings = EstimationResult(
            params_inits=restart_shard,
            params_optims=restart_shard,
            nll_optims=restart_shard,
            num_lbfgs_iters=restart_shard,
            num_nll_evals=restart_shard,
            gammas=rep,
        )
        return jax.jit(fn, in_shardings=(restart_shard, rep), out_shardings=out_shardings)

    return deco
