"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with x64 enabled so analytic-solution oracles can be
checked at tight tolerances. TPU-path numerics (f32) are exercised by casting
inputs explicitly in the tests that need it.
"""

import os

# Must be set before jax initializes its backends. Hard override: the shell
# may point JAX at a (remote) TPU; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote-TPU backend and forces
# JAX_PLATFORMS=axon; override through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
