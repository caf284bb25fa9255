"""YAML experiment-config system.

Keeps the reference's config shape — ``class_path``/``init_args`` object
graphs plus flat script kwargs (configs/gt/lotkavolterra.yaml et al.) — but
resolves classes against this framework's registries, so reference configs
work after only renaming the class paths (and in most cases without even
that: resolution falls back to the final path component, and the reference's
``src.ode.LotkaVolterra`` style names resolve to our factories).

No jsonargparse dependency: a small resolver + argparse front-end.
"""

from __future__ import annotations

import argparse
import ast
from typing import Any, Callable, Dict, Optional

import yaml


def _sqrt_ekf_adapter(
    cov_update_fn_builder=None,
    static_cov_update_fn_builder=None,
    disable_cov_update: bool = False,
    cov_update=None,
):
    """Accepts both this framework's and the reference's ctor arg names
    (src/filters/sqrt_ekf.py:36-43). The static update builder is config
    noise in the reference (used only through script flags); a configured
    scale is honored via the calibration/static paths."""
    from ode_uncertainty_tpu.filters import DiagonalUpdate, SqrtEKF

    cu = cov_update if cov_update is not None else cov_update_fn_builder
    ekf = SqrtEKF(cov_update=cu or DiagonalUpdate(), disable_cov_update=disable_cov_update)
    # stash for scripts that need the static-scale baseline
    object.__setattr__(ekf, "static_cov_update", static_cov_update_fn_builder)
    return ekf


def _particle_filter_adapter(
    cov_update_fn_builder=None,
    static_cov_update_fn_builder=None,
    num_particles: int = 100,
    cov_update=None,
):
    from ode_uncertainty_tpu.filters import DiagonalUpdate, ParticleFilter

    cu = cov_update if cov_update is not None else cov_update_fn_builder
    pf = ParticleFilter(cov_update=cu or DiagonalUpdate(), num_particles=num_particles)
    object.__setattr__(pf, "static_cov_update", static_cov_update_fn_builder)
    return pf


def _hh_adapter(model: str = None, variant: str = "reduced-1", **kwargs):
    from ode_uncertainty_tpu.models import hodgkin_huxley

    return hodgkin_huxley(variant=model or variant, **kwargs)


def _mc_hh_adapter(model: str = None, variant: str = "reduced-1", **kwargs):
    """Multi-compartment HH; reference configs pass per-compartment vectors
    as stringified python lists (src/ode/hodgkin_huxley.py:332-349)."""
    from ode_uncertainty_tpu.models import multi_compartment_hodgkin_huxley

    parsed = {k: parse_literal(v) if isinstance(v, str) else v for k, v in kwargs.items()}
    if "coupling_coeffs" in parsed and not isinstance(parsed["coupling_coeffs"], (list, tuple)):
        parsed["coupling_coeffs"] = [parsed["coupling_coeffs"]]
    return multi_compartment_hodgkin_huxley(variant=model or variant, **parsed)


def _registries():
    from ode_uncertainty_tpu.filters import COV_UPDATE_REGISTRY, FILTER_REGISTRY
    from ode_uncertainty_tpu.inference.schedules import SCHEDULE_REGISTRY
    from ode_uncertainty_tpu.models import MODEL_REGISTRY
    from ode_uncertainty_tpu.solvers import SOLVER_REGISTRY

    merged: Dict[str, Callable] = {}
    for reg in (MODEL_REGISTRY, SOLVER_REGISTRY, FILTER_REGISTRY, COV_UPDATE_REGISTRY, SCHEDULE_REGISTRY):
        merged.update(reg)
    # reference-name adapters (accept the reference's ctor arg conventions)
    merged["SQRT_EKF"] = _sqrt_ekf_adapter
    merged["ParticleFilter"] = _particle_filter_adapter
    merged["HodgkinHuxley"] = _hh_adapter
    merged["MultiCompartmentHodgkinHuxley"] = _mc_hh_adapter
    merged.setdefault("DiffraxSolverBuilder", _diffrax_alias)
    return merged


def _diffrax_alias(name: str = "Kvaerno3", step_size: float = 0.1, **kw):
    """Maps the reference's diffrax wrapper config onto native solvers."""
    from ode_uncertainty_tpu.solvers import SOLVER_REGISTRY

    if name not in SOLVER_REGISTRY:
        raise ValueError(
            f"No native equivalent for diffrax solver {name!r}; available: "
            f"{sorted(SOLVER_REGISTRY)}"
        )
    return SOLVER_REGISTRY[name](step_size=step_size)


def resolve_class(class_path: str) -> Callable:
    """Resolves a class path by its final component against the registries."""
    name = class_path.rsplit(".", 1)[-1]
    reg = _registries()
    if name not in reg:
        raise KeyError(f"Unknown class {class_path!r} (known: {sorted(reg)})")
    return reg[name]


def instantiate(node: Any) -> Any:
    """Recursively instantiates class_path/init_args object graphs."""
    if isinstance(node, dict):
        if "class_path" in node:
            factory = resolve_class(node["class_path"])
            init_args = {k: instantiate(v) for k, v in node.get("init_args", {}).items()}
            return factory(**init_args)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def parse_literal(value: Optional[str]):
    """Parses stringified python literals (x0, matrices, weight vectors) —
    the reference's array-argument convention (SURVEY.md §5)."""
    if value is None:
        return None
    if isinstance(value, (list, tuple, float, int)):
        return value
    return ast.literal_eval(value)


def apply_runtime_config(raw: Dict[str, Any]) -> None:
    """Applies platform/precision pins BEFORE any jax array is created.

    Must run before :func:`instantiate`: building model/solver objects
    creates jax arrays, which initializes the backend — after which
    ``jax_platforms`` is frozen and pre-existing arrays keep their dtype.
    (The axon sitecustomize otherwise routes everything to the remote TPU,
    and ``float64: true`` configs would get f32 model parameters.)
    """
    import os

    import jax

    platform = raw.get("platform") or os.environ.get("ODEUQ_PLATFORM")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if raw.get("float64", False):
        jax.config.update("jax_enable_x64", True)


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Loads a YAML config into a kwargs dict with objects instantiated."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if overrides:
        raw.update({k: v for k, v in overrides.items() if v is not None})
    apply_runtime_config(raw)
    return {k: instantiate(v) for k, v in raw.items()}


def config_cli(
    description: str,
    extra_args: Optional[Dict[str, Any]] = None,
    positional: Optional[list] = None,
):
    """argparse front-end:
    ``script.py (--config cfg.yaml | --experiment family/name) [--set k=v]``.

    ``--experiment`` resolves against the registry in configs/experiments.py
    (the reference's full 94-config surface as code).
    """
    ap = argparse.ArgumentParser(description=description)
    for arg, kw in positional or []:
        ap.add_argument(arg, **kw)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--config", help="YAML config path")
    g.add_argument("--experiment", help="registry name, e.g. params/lotkavolterra2")
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="override a top-level config key (YAML-parsed value)",
    )
    ns = ap.parse_args()
    overrides = {}
    for item in ns.set:
        key, _, val = item.partition("=")
        overrides[key] = yaml.safe_load(val)

    if ns.config:
        cfg = load_config(ns.config, overrides)
    else:
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[2]
        sys.path.insert(0, str(repo / "configs"))
        import experiments

        raw = experiments.build(ns.experiment)
        raw.update({k: v for k, v in overrides.items() if v is not None})
        apply_runtime_config(raw)
        cfg = {k: instantiate(v) for k, v in raw.items()}
    if extra_args:
        for k, v in extra_args.items():
            cfg.setdefault(k, v)
    for arg, _ in positional or []:
        cfg[arg.lstrip("-")] = getattr(ns, arg.lstrip("-"))
    return cfg
