"""ode-uncertainty-tpu: a TPU-native probabilistic-ODE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``f-lair/ode-uncertainty`` reference (Bayesian filtering for black-box ODE
solvers): probabilistic ODE solutions whose covariance is driven by the
solver's embedded local-error estimate, and ODE parameter estimation by
tempered maximum-likelihood through the filter.

Architecture (TPU-first, not a port):
  * ``models``    — ODE zoo as pure RHS functions + metadata.
  * ``solvers``   — embedded explicit RK (unrolled tableau stages) and
                    ESDIRK implicit steppers with real local-error output.
  * ``ops``       — square-root linear-algebra kernels (QR sums, sqrt
                    Gaussian densities), linearization pushforward.
  * ``filters``   — square-root EKF and particle (perturbation) filter,
                    written unbatched and lifted with ``vmap``.
  * ``inference`` — on-device batched projected L-BFGS, process-noise
                    tempering, NLL landscape evaluation, calibration, tRMSE.
  * ``parallel``  — mesh / sharding utilities for scale-out over restarts.
  * ``utils``     — H5 IO, YAML config instantiation, profiling harness.

Everything runs under ``jit`` with static shapes; batching axes (restarts ×
tempering × particles) are ``vmap``/``shard_map`` axes rather than process
pools (reference: scripts/run_parameter_estimation.py:266-272).
"""

__version__ = "0.1.0"

from ode_uncertainty_tpu import (  # noqa: F401
    filters,
    inference,
    models,
    ops,
    parallel,
    solvers,
    utils,
)
