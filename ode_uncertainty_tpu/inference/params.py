"""Parameter-space specification for estimation.

Handles the normalized-box parameterization used by the optimizer: a flat
vector in [0, 1]^P over the *optimized* parameter subset, scattered into the
full default parameter dict at evaluation time (parity:
/root/reference/scripts/run_parameter_estimation.py:735-742, src/utils.py:
131-178). All bookkeeping is precomputed on the host; the traced path is one
gather-scatter plus elementwise affine ops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ode_uncertainty_tpu.models.base import Params


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Static description of the estimation parameter space.

    The flat layout follows sorted parameter names (matching
    ``ravel_pytree`` on a dict, so H5 outputs are comparable with the
    reference's).
    """

    keys: Tuple[str, ...]  # sorted parameter names (full set)
    shapes: Tuple[Tuple[int, ...], ...]
    defaults_flat: jax.Array  # [P_full]
    mins_flat: jax.Array  # [P_full]
    maxs_flat: jax.Array  # [P_full]
    opt_indices: jax.Array  # [P_opt] int32 into the full flat vector
    opt_keys: Tuple[str, ...]  # names owning each optimized entry

    @property
    def num_full(self) -> int:
        return int(self.defaults_flat.shape[0])

    @property
    def num_opt(self) -> int:
        return int(self.opt_indices.shape[0])

    def unflatten(self, flat: jax.Array) -> Params:
        out = {}
        pos = 0
        for k, shp in zip(self.keys, self.shapes):
            size = int(np.prod(shp)) if shp else 1
            out[k] = flat[pos : pos + size].reshape(shp)
            pos += size
        return out

    def flatten(self, params: Params) -> jax.Array:
        return jnp.concatenate(
            [jnp.ravel(jnp.asarray(params[k])) for k in self.keys]
        )

    # --- optimized-subset (normalized) space --------------------------------
    def to_params(self, p_norm_opt: jax.Array) -> Params:
        """Maps a normalized optimized vector [P_opt] to a full param dict."""
        lo = self.mins_flat[self.opt_indices]
        hi = self.maxs_flat[self.opt_indices]
        vals = p_norm_opt * (hi - lo) + lo
        full = self.defaults_flat.at[self.opt_indices].set(vals)
        return self.unflatten(full)

    def opt_to_physical(self, p_norm_opt: jax.Array) -> jax.Array:
        """Normalized optimized vector -> physical values [..., P_opt]."""
        lo = self.mins_flat[self.opt_indices]
        hi = self.maxs_flat[self.opt_indices]
        return p_norm_opt * (hi - lo) + lo

    def physical_to_opt(self, p_phys: jax.Array) -> jax.Array:
        lo = self.mins_flat[self.opt_indices]
        hi = self.maxs_flat[self.opt_indices]
        return (p_phys - lo) / (hi - lo)

    def defaults_norm_opt(self) -> jax.Array:
        """Default values of the optimized subset, normalized."""
        return self.physical_to_opt(self.defaults_flat[self.opt_indices])

    def sample_norm(self, key: jax.Array, num: int) -> jax.Array:
        """Uniform restarts in the normalized box: [num, P_opt]."""
        return jax.random.uniform(key, (num, self.num_opt), self.defaults_flat.dtype)

    def opt_mask_full(self) -> jax.Array:
        mask = jnp.zeros(self.num_full, bool)
        return mask.at[self.opt_indices].set(True)


def make_param_spec(
    defaults: Params,
    params_range: Mapping[str, Tuple[float, float]],
    params_optimized: Mapping[str, bool] | None = None,
    dtype=jnp.float32,
) -> ParamSpec:
    """Builds a :class:`ParamSpec`.

    Args:
        defaults: model default parameter dict.
        params_range: per-name (min, max) bounds (required for every name).
        params_optimized: per-name bool; missing names default to True.
    """
    keys = tuple(sorted(defaults.keys()))
    if params_optimized is None:
        params_optimized = {k: True for k in keys}
    shapes = []
    defaults_parts, mins_parts, maxs_parts = [], [], []
    opt_idx, opt_keys = [], []
    pos = 0
    for k in keys:
        v = np.asarray(defaults[k], dtype=np.float64)
        shapes.append(tuple(v.shape))
        size = v.size
        lo, hi = params_range.get(k, (np.nan, np.nan))
        if params_optimized.get(k, True) and (np.isnan(lo) or np.isnan(hi)):
            raise ValueError(f"params_range missing for optimized parameter {k!r}")
        defaults_parts.append(v.ravel())
        mins_parts.append(np.full(size, lo))
        maxs_parts.append(np.full(size, hi))
        if params_optimized.get(k, True):
            opt_idx.extend(range(pos, pos + size))
            opt_keys.extend([k] * size)
        pos += size
    return ParamSpec(
        keys=keys,
        shapes=tuple(shapes),
        defaults_flat=jnp.asarray(np.concatenate(defaults_parts), dtype),
        mins_flat=jnp.asarray(np.concatenate(mins_parts), dtype),
        maxs_flat=jnp.asarray(np.concatenate(maxs_parts), dtype),
        opt_indices=jnp.asarray(np.asarray(opt_idx, np.int32)),
        opt_keys=tuple(opt_keys),
    )
