"""IO, config, profiling, debugging, checkpointing utilities."""

from ode_uncertainty_tpu.utils.checkpoint import run_stage_grid
from ode_uncertainty_tpu.utils.config import config_cli, instantiate, load_config, parse_literal
from ode_uncertainty_tpu.utils.debug import assert_finite, count_nonfinite, debug_nans, tap_stats
from ode_uncertainty_tpu.utils.io import load_data, store_data
from ode_uncertainty_tpu.utils.profiling import PhaseTimer, benchmark, device_trace
from ode_uncertainty_tpu.utils.scan import scan_save

__all__ = [
    "run_stage_grid",
    "config_cli",
    "instantiate",
    "load_config",
    "parse_literal",
    "assert_finite",
    "count_nonfinite",
    "debug_nans",
    "tap_stats",
    "load_data",
    "store_data",
    "PhaseTimer",
    "benchmark",
    "device_trace",
    "scan_save",
]
