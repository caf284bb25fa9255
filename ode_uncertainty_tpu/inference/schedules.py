"""Process-noise tempering schedules.

gamma(idx) gives the process-noise magnitude at tempering stage idx
(parity: /root/reference/src/noise_schedules.py). Schedules are vectorized:
``gammas(num_stages, final_zero)`` returns the whole stage vector so the
tempering loop can be a ``lax.scan`` over a traced gamma array.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    init_noise_log: float = 0.0

    def gamma(self, idx):
        raise NotImplementedError

    def gammas(self, num_stages: int, final_zero: bool = True) -> jax.Array:
        """Stage vector [num_stages]; optionally zero at the last stage
        (parity: run_parameter_estimation.py:621-623)."""
        g = jax.vmap(self.gamma)(jnp.arange(num_stages))
        if final_zero and num_stages > 0:
            g = g.at[-1].set(0.0)
        return g


@dataclasses.dataclass(frozen=True)
class LinearDecaySchedule(NoiseSchedule):
    """log10-linear decay: gamma = 10^(init - idx * rate)."""

    decay_rate: float = 1.0

    def gamma(self, idx):
        return jnp.power(10.0, self.init_noise_log - idx * self.decay_rate)


@dataclasses.dataclass(frozen=True)
class ExponentialDecaySchedule(NoiseSchedule):
    """Power-law decay: gamma = 10^init / (idx + 1)^rate."""

    decay_rate: float = 8.0

    def gamma(self, idx):
        return jnp.power(10.0, self.init_noise_log - self.decay_rate * jnp.log10(idx + 1.0))


@dataclasses.dataclass(frozen=True)
class CosineAnnealingSchedule(NoiseSchedule):
    """Cosine annealing between init and min log-noise, cyclic."""

    min_noise_log: float = -10.0
    cycle_length: int = 4

    def gamma(self, idx):
        idx_in_cycle = jnp.mod(idx, self.cycle_length)
        frac = idx_in_cycle / (self.cycle_length - 1)
        log_g = self.min_noise_log + 0.5 * (self.init_noise_log - self.min_noise_log) * (
            1.0 + jnp.cos(frac * jnp.pi)
        )
        return jnp.power(10.0, log_g)


SCHEDULE_REGISTRY = {
    "LinearDecaySchedule": LinearDecaySchedule,
    "ExponentialDecaySchedule": ExponentialDecaySchedule,
    "CosineAnnealingSchedule": CosineAnnealingSchedule,
}
