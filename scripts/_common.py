"""Shared script plumbing: path setup, precision switch, rig construction."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def setup_precision(cfg) -> "object":
    """Applies the config's precision choice before heavy jax use.

    ``float64: true`` enables x64 (validation parity with the f64 reference);
    default is float32, the TPU-native path (SURVEY.md §7.1.4). Also enables
    the persistent compilation cache so repeated/resumed script runs skip
    recompiles.
    """
    import jax

    # Optional platform pin (cfg 'platform' or ODEUQ_PLATFORM env). Forcing
    # CPU needs BOTH the env var and the config update before backend init
    # (the axon sitecustomize otherwise routes to the remote TPU).
    platform = cfg.get("platform") or os.environ.get("ODEUQ_PLATFORM")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    else:
        # This script is about to claim the single TPU chip: register as the
        # active client (bench.py quiesces via this pid) and never start
        # while the benchmark holds the chip — exit 75 so babysitters wait
        # for the lock and relaunch instead of counting a failure.
        from ode_uncertainty_tpu.utils import runlock

        runlock.check_quiesce("client startup")
        runlock.register_client()

    cache_dir = os.environ.get("ODEUQ_JAX_CACHE", os.path.expanduser("~/.jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if cfg.get("float64", False):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    return jnp.float64 if cfg.get("float64", False) else jnp.float32


def num_steps_of(cfg, solver) -> int:
    return int(math.ceil((cfg["tN"] - cfg.get("t0", 0.0)) / solver.h))


def build_x0(cfg, model, dtype):
    import jax.numpy as jnp

    from ode_uncertainty_tpu.utils.config import parse_literal

    x0_raw = jnp.asarray(parse_literal(cfg["x0"]), dtype)
    x0_built = model.build_initial_value(x0_raw, model.params).astype(dtype)
    return x0_raw, x0_built


def build_p0_sqrt(cfg, n, dtype):
    import jax.numpy as jnp

    from ode_uncertainty_tpu.ops import const_diag
    from ode_uncertainty_tpu.utils.config import parse_literal

    p0 = cfg.get("P0")
    if p0 is None:
        return const_diag(n, 1e-12, dtype)
    return jnp.linalg.cholesky(jnp.asarray(parse_literal(p0), dtype))


def load_observations(cfg, solver, num_steps, n, dtype):
    """Returns an ObsModel from the config's y_path/measurement_matrix, or a
    prediction-only stub when absent (parity: run_filter.py:114-121)."""
    import jax.numpy as jnp

    from ode_uncertainty_tpu.inference import empty_obs_model, make_obs_model
    from ode_uncertainty_tpu.utils.config import parse_literal
    from ode_uncertainty_tpu.utils.io import load_data

    y_path = cfg.get("y_path")
    mm = cfg.get("measurement_matrix")
    if y_path is None or mm is None:
        return empty_obs_model(n, num_steps, dtype=dtype), False
    data = load_data(y_path)
    h_mat = np.asarray(parse_literal(mm), dtype=float)
    ys_raw = np.asarray(data["x"])
    ts_y = np.asarray(data["t"])
    obs = make_obs_model(
        h_mat,
        ts_y,
        ys_raw,
        cfg.get("obs_noise_var", 1e-3),
        cfg.get("t0", 0.0),
        solver.h,
        num_steps,
        dtype=dtype,
    )
    return obs, True
