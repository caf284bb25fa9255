"""Chunked scan-with-save: run a step function num_steps times, storing every
``save_every``-th state (plus the initial one) without materializing the
intermediate states in HBM."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def scan_save(step_fn, state0, num_steps: int, save_every: int = 1):
    """Runs ``state = step_fn(state, idx)`` for idx in [0, num_steps) and
    returns (final_state, trajectory) where trajectory stacks the initial
    state and every save_every-th state along a new leading axis.

    Only ``num_steps // save_every * save_every`` steps are executed (the
    trailing partial chunk would never be saved; parity with the reference's
    ``[::interval]`` host-side slice, scripts/run_ode_solver.py:105-110).
    """
    chunks = num_steps // save_every

    def chunk_body(carry, chunk_idx):
        def inner(i, s):
            return step_fn(s, chunk_idx * save_every + i)

        s = lax.fori_loop(0, save_every, inner, carry)
        return s, s

    last, traj = lax.scan(chunk_body, state0, jnp.arange(chunks))
    traj = jax.tree.map(lambda i, t: jnp.concatenate([i[None], t], axis=0), state0, traj)
    return last, traj
