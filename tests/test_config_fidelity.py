"""Full-surface config fidelity: all 94 registry experiments vs the
reference's YAML files.

For every experiment in configs/experiments.py, loads the same-named
reference config (/root/reference/configs/...) and requires semantic
equality on every reference key: class-path nodes are instantiated through
our own resolver (which accepts the reference's ``src.*`` names) and
compared as objects — model parameter pytrees, solver step sizes, filter
settings, schedule coefficients — while scalars/string-literals compare
numerically. This generalizes the older c2-only fidelity test and is what
caught the gt/rlc R-L-C values and the per-family g_T / num_param_evals /
gamma_noise_weights variations (see the fix commit).

Deliberate normalizations:
  * ``output``/``y_path`` compare by basename (family directories are
    renamed: ekf_trajectory_conrad_baseline -> ekf_trajectory, etc.).
  * ``disable_pbar``/``verbose``/``num_processes`` are ignored: progress
    bars and the process pool have no equivalent here (restarts are a
    vmapped batch axis; SURVEY.md §2.8).
  * a reference key holding ``null`` may be absent on our side.
"""

import dataclasses
import os
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

import jax

from ode_uncertainty_tpu.utils.config import instantiate, parse_literal

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "configs"))

REF = Path("/root/reference/configs")
FAMILY_MAP = {
    "ekf_trajectory": "ekf_trajectory_conrad_baseline",
    "pf_trajectory": "pf_trajectory_conrad_baseline",
    "calibration": "calibration_conrad_baseline",
}
IGNORE_KEYS = {"disable_pbar", "verbose", "num_processes"}
BASENAME_KEYS = {"output", "y_path"}


def _ref_path(name: str) -> Path:
    parts = name.split("/")
    parts[0] = FAMILY_MAP.get(parts[0], parts[0])
    return REF.joinpath(*parts).with_suffix(".yaml")


def _plain(v):
    if isinstance(v, (jax.Array, np.ndarray)):
        return np.asarray(v).tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v


def _obj_sig(o):
    """Semantic signature of an instantiated config object: type name,
    parameter pytree, and every non-callable dataclass field."""
    d = {"type": type(o).__name__}
    if isinstance(getattr(o, "params", None), dict):
        d["params"] = _plain(o.params)
    if dataclasses.is_dataclass(o):
        for f in dataclasses.fields(o):
            v = getattr(o, f.name)
            if callable(v) and not dataclasses.is_dataclass(v):
                continue
            d[f.name] = (
                _obj_sig(v)
                if (dataclasses.is_dataclass(v) or hasattr(v, "params"))
                else _plain(v)
            )
    return d


def _close(a, b):
    try:
        an, bn = np.asarray(a, dtype=float), np.asarray(b, dtype=float)
        return an.shape == bn.shape and bool(np.allclose(an, bn, rtol=1e-12, atol=0))
    except (ValueError, TypeError):
        return a == b


def _close_sig(a, b):
    if type(a) is not type(b):
        return False
    if isinstance(a, dict):
        return set(a) == set(b) and all(_close_sig(a[k], b[k]) for k in a)
    if isinstance(a, list):
        return len(a) == len(b) and all(_close_sig(x, y) for x, y in zip(a, b))
    return _close(a, b)


def _cmp(key, ref_v, our_v, path, diffs):
    p = f"{path}.{key}" if path else key
    if ref_v is None or our_v is None:
        if ref_v is not our_v:
            diffs.append((p, ref_v, our_v))
        return
    if isinstance(ref_v, dict) and "class_path" in ref_v:
        if not (isinstance(our_v, dict) and "class_path" in our_v):
            diffs.append((p, ref_v, our_v))
            return
        rs, os_ = _obj_sig(instantiate(ref_v)), _obj_sig(instantiate(our_v))
        if rs != os_ and not _close_sig(rs, os_):
            diffs.append((p, rs, os_))
        return
    if isinstance(ref_v, dict):
        if not isinstance(our_v, dict):
            diffs.append((p, ref_v, our_v))
            return
        for k, v in ref_v.items():
            if k in IGNORE_KEYS:
                continue
            if k not in our_v:
                if v is not None:
                    diffs.append((f"{p}.{k}", v, "<missing>"))
            else:
                _cmp(k, v, our_v[k], p, diffs)
        return
    if key in BASENAME_KEYS and isinstance(ref_v, str):
        if os.path.basename(ref_v) != os.path.basename(str(our_v)):
            diffs.append((p, ref_v, our_v))
        return
    if isinstance(ref_v, str):
        try:
            rl = parse_literal(ref_v)
            ol = parse_literal(our_v) if isinstance(our_v, str) else our_v
            if not _close(rl, ol):
                diffs.append((p, ref_v, our_v))
            return
        except (ValueError, SyntaxError):
            pass
        if ref_v != our_v:
            diffs.append((p, ref_v, our_v))
        return
    if not _close(ref_v, our_v):
        diffs.append((p, ref_v, our_v))


@pytest.mark.skipif(not REF.exists(), reason="reference configs not mounted")
def test_all_94_experiments_match_reference_configs():
    import experiments  # noqa: F401  (tests/conftest puts configs/ on sys.path)

    names = experiments.all_experiments()
    assert len(names) == 94
    failures = {}
    for name in names:
        rp = _ref_path(name)
        assert rp.exists(), f"no reference config for {name}: {rp}"
        with open(rp) as f:
            ref_raw = yaml.safe_load(f)
        ours_raw = experiments.build(name)
        diffs = []
        for k, v in ref_raw.items():
            if k in IGNORE_KEYS:
                continue
            if k not in ours_raw:
                if v is not None:
                    diffs.append((k, v, "<missing>"))
            else:
                _cmp(k, v, ours_raw[k], "", diffs)
        if diffs:
            failures[name] = diffs
    assert not failures, "\n".join(
        f"{n}: " + "; ".join(f"{p}: ref={r!r} ours={o!r}"[:220] for p, r, o in ds)
        for n, ds in failures.items()
    )
