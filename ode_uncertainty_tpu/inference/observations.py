"""Observation model bundle for filtering and estimation.

Packs the measurement matrix, measurement noise, projected observations and
the per-step alignment arrays into one pytree (the reference threads five
separate arrays through every function; scripts/run_filter.py:97-123).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ode_uncertainty_tpu.ops.align import build_observation_maps
from ode_uncertainty_tpu.ops.sqrt_linalg import const_diag


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObsModel:
    """Observations aligned to the solver's step grid.

    Attributes:
        H: [L, n] measurement matrix (n = flat state size).
        R_sqrt: [L, L] observation-noise sqrt.
        ys: [T_obs, L] projected observations (H applied).
        flags: [num_steps] bool, step has an observation.
        index_map: [num_steps] int32, step -> observation row.
    """

    H: jax.Array
    R_sqrt: jax.Array
    ys: jax.Array
    flags: jax.Array
    index_map: jax.Array

    @property
    def obs_dim(self) -> int:
        return self.H.shape[0]


def make_obs_model(
    H,
    ts_y,
    ys_raw,
    obs_noise_var: float,
    t0: float,
    step_size: float,
    num_steps: int,
    dtype=jnp.float32,
    tol: float = None,
) -> ObsModel:
    """Builds an :class:`ObsModel` from raw observation data.

    ys_raw: [T_obs, ...] raw states; projected through H after flattening
    trailing dims (parity: run_filter.py:112, ys = einsum('ij,tj->ti')).

    The alignment tolerance defaults to a quarter of the FINER of the two
    grids (solver step vs observation spacing): matching within half the
    finer spacing is unambiguous, and float32 time grids carry absolute
    errors far above the reference's 1e-8 (which silently drops
    observations at f32). Scaling by the solver step alone breaks when the
    observation grid is finer than the solver grid (e.g. the calibration
    configs pair an h=0.01 filter with dt=1e-3 ground-truth observations,
    /root/reference/configs/calibration_conrad_baseline/rkf45/vanderpol.yaml):
    a step_size/4 window then matches several observation times per step.
    """
    H = jnp.asarray(H, dtype)
    ys_flat = jnp.asarray(ys_raw, dtype).reshape(len(ts_y), -1)
    ys = ys_flat @ H.T
    if tol is None:
        ts_y64 = np.asarray(ts_y, np.float64)
        obs_spacing = np.min(np.diff(ts_y64)) if len(ts_y64) > 1 else np.inf
        tol = 0.25 * min(step_size, obs_spacing)
    flags, index_map = build_observation_maps(
        t0, step_size, num_steps, np.asarray(ts_y, np.float64), tol=tol
    )
    return ObsModel(
        H=H,
        R_sqrt=const_diag(H.shape[0], obs_noise_var**0.5, dtype),
        ys=ys,
        flags=jnp.asarray(flags),
        index_map=jnp.asarray(index_map),
    )


def empty_obs_model(n: int, num_steps: int, dtype=jnp.float32) -> ObsModel:
    """Prediction-only mode: no observations, no corrections."""
    return ObsModel(
        H=jnp.eye(n, dtype=dtype),
        R_sqrt=jnp.zeros((n, n), dtype),
        ys=jnp.zeros((1, n), dtype),
        flags=jnp.zeros(num_steps, dtype=bool),
        index_map=jnp.zeros(num_steps, dtype=jnp.int32),
    )
