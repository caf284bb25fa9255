"""Mesh / sharding utilities for scale-out over the restart axis."""

from ode_uncertainty_tpu.parallel.mesh import (
    RESTART_AXIS,
    device_mesh,
    make_sharded_nll_landscape,
    make_sharded_tempered_estimator,
    replicated,
    restart_sharding,
    shard_restarts,
)

__all__ = [
    "RESTART_AXIS",
    "device_mesh",
    "make_sharded_nll_landscape",
    "make_sharded_tempered_estimator",
    "replicated",
    "restart_sharding",
    "shard_restarts",
]
