"""Reference-artifact parity hook (round-3 verdict item: cross-check vs
genuine reference outputs whenever the environment can supply them).

Point ``ODEUQ_REFERENCE_RESULTS`` at a directory laid out like the
reference's ``results/`` tree (what ``/root/reference/scripts/*.py`` write:
``gt/``, ``noise_gt/``, ``params/``, ...). Every ``*.h5`` found under it is
matched to the same-named experiment in ``configs/experiments.py`` and
checked against this framework on CPU f64:

* ``gt/<system>.h5`` — the trajectory is re-solved here and ``t``/``x``
  are compared directly (reference writer: scripts/run_ode_solver.py:74).
* ``noise_gt/<system>.h5`` — ``t`` compared; the residual against our
  clean re-solve must be N(0, noise_var) (the reference drew its noise
  from its own PRNG stream, so values can't be compared elementwise).
* ``params*/<problem>.h5`` — the strong check: OUR NLL evaluated at the
  reference's stored optimized parameters must reproduce its stored
  ``nll_optims`` stage by stage (reference writer:
  scripts/run_parameter_estimation.py:297-308, 620-652). The observation
  file is resolved *inside the reference tree* so both sides score the
  same data; if it isn't present the check skips with a message.
* anything else (``ekf_trajectory/``, ``calibration/`` ...) — compared
  key-by-key against this repo's committed artifact of the same relative
  path under ``results/`` (run the matching CLI first if absent).

Without the env var the parametrized hook skips. ``test_selftest_*``
always run the same machinery against this repo's own (schema-identical)
``results/`` tree, so the hook itself can't rot while waiting for a real
reference artifact to appear.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
for sub in ("scripts", "configs"):
    p = str(REPO / sub)
    if p not in sys.path:
        sys.path.insert(0, p)

REF_ENV = "ODEUQ_REFERENCE_RESULTS"

# Cross-implementation tolerance for f64-vs-f64 NLL agreement. The two
# frameworks share the math but not the floating-point schedule (unrolled
# Householder QR vs LAPACK, fused scans, different reduction orders), so
# bitwise equality is out; 1e-4 relative over thousands of accumulated
# filter steps is the observed same-math/different-schedule envelope.
# Override via env when scoring artifacts from an f32 optimizer (observed
# self-rescore drift of our own f32 TPU runs: ~6e-4 relative).
NLL_RTOL = float(os.environ.get("ODEUQ_CROSSCHECK_RTOL", "1e-4"))
NLL_ATOL = float(os.environ.get("ODEUQ_CROSSCHECK_ATOL", "5e-3"))


def _load_h5(path):
    h5py = pytest.importorskip("h5py")
    out = {}
    with h5py.File(path, "r") as f:
        for k in f.keys():
            out[k] = f[k][()]
    return out


def _collect(root):
    return sorted(p.relative_to(root) for p in Path(root).rglob("*.h5"))


def _experiment_of(relpath: Path) -> str:
    return str(relpath.with_suffix(""))


def _build_cfg(experiment: str) -> dict:
    import experiments

    from ode_uncertainty_tpu.utils.config import instantiate

    cfg = {k: instantiate(v) for k, v in experiments.build(experiment).items()}
    cfg["float64"] = True
    return cfg


def _resolve_obs_path(cfg, ref_root):
    """Re-roots the config's ../results/... observation path into the
    reference tree, so estimation checks score the reference's own data."""
    y = cfg.get("y_path")
    if y is None:
        return
    parts = [p for p in Path(y).parts if p not in ("..", "results")]
    cand = Path(ref_root, *parts)
    if not cand.exists():
        pytest.skip(f"estimation check needs {cand} next to the artifact")
    cfg["y_path"] = str(cand)


def _resolve(relpath: Path, ref_root: Path):
    """Dispatches one reference artifact to its parity check."""
    ref = _load_h5(ref_root / relpath)
    family = relpath.parts[0]
    exp = _experiment_of(relpath)
    if family in ("gt", "noise_gt"):
        _check_trajectory(exp, ref)
    elif family.startswith("params"):
        _check_estimation(exp, ref, ref_root)
    else:
        _check_against_local_artifact(relpath, ref)


def _check_trajectory(exp, ref):
    import jax.numpy as jnp
    from _common import build_x0, num_steps_of

    from ode_uncertainty_tpu.solvers import make_solve_fn

    cfg = _build_cfg(exp)
    model = cfg["ode_builder"]
    solver = cfg["solver_builder"]
    num_steps = num_steps_of(cfg, solver)
    _, x0 = build_x0(cfg, model, jnp.float64)
    run = make_solve_fn(solver, model, num_steps, cfg.get("save_interval", 1))
    traj = run(cfg.get("t0", 0.0), x0, model.params)
    t = np.asarray(traj["t"])
    x = np.asarray(traj["x"])

    assert ref["t"].shape == t.shape, f"{exp}: t shape {ref['t'].shape} vs {t.shape}"
    np.testing.assert_allclose(ref["t"], t, atol=solver.h / 4)
    ref_x = np.asarray(ref["x"]).reshape(x.shape)
    noise_var = float(cfg.get("noise_var", 0.0))
    if noise_var > 0.0:
        resid = ref_x - x
        std = float(resid.std())
        assert abs(std - noise_var**0.5) < 0.25 * noise_var**0.5, (
            f"{exp}: residual std {std:.4f} inconsistent with "
            f"noise_var {noise_var} (clean-trajectory mismatch?)"
        )
    else:
        scale = float(max(1.0, np.abs(x).max()))
        np.testing.assert_allclose(ref_x, x, atol=1e-4 * scale, rtol=1e-4)


def _check_estimation(exp, ref, ref_root, max_rows=4):
    import jax
    import jax.numpy as jnp

    cfg = _build_cfg(exp)
    _resolve_obs_path(cfg, ref_root)

    names = [n.decode() if isinstance(n, bytes) else str(n) for n in ref["params_name"]]
    p_opt = np.asarray(ref["params_optims"], np.float64)
    nll_ref = np.asarray(ref["nll_optims"], np.float64)

    if exp.startswith("params_baseline"):
        import run_parameter_estimation_baseline as base_cli

        _, _, spec, _, nll, _ = base_cli._build_rig(cfg, jnp.float64)
        nll_of = jax.jit(nll)
        p_opt = p_opt[:, None, :]  # [R, P] -> [R, 1, P]
        nll_ref = nll_ref[:, None]
        gammas = np.zeros(1)
        eval_nll = lambda p_norm, s: nll_of(p_norm)
    else:
        import run_parameter_estimation as est_cli

        _, _, spec, _, _, _, nll, q_sqrt, _ = est_cli._build_rig(cfg, jnp.float64)
        gammas = np.asarray(est_cli._gammas(cfg, jnp.float64), np.float64)
        nll_of = jax.jit(nll)
        eval_nll = lambda p_norm, s: nll_of(
            p_norm, q_sqrt, jnp.sqrt(jnp.asarray(gammas[s], jnp.float64))
        )

    assert tuple(names) == tuple(spec.opt_keys), (
        f"{exp}: parameter order {names} vs ours {spec.opt_keys}"
    )
    R, S, P = p_opt.shape
    assert P == spec.num_opt
    assert S == len(gammas), f"{exp}: {S} stages vs schedule {len(gammas)}"

    # Best final-stage rows (the reference writes nll=0 for errored stages).
    final = nll_ref[:, -1]
    ok_rows = np.flatnonzero(np.isfinite(final) & (final != 0.0))
    assert ok_rows.size, f"{exp}: no finished restarts in reference artifact"
    rows = ok_rows[np.argsort(final[ok_rows])][:max_rows]

    checked = 0
    for r in rows:
        for s in range(S):
            if not np.isfinite(nll_ref[r, s]) or nll_ref[r, s] == 0.0:
                continue
            p_norm = spec.physical_to_opt(jnp.asarray(p_opt[r, s]))
            ours = float(eval_nll(p_norm, s))
            assert np.isfinite(ours), f"{exp}: our NLL non-finite at row {r} stage {s}"
            np.testing.assert_allclose(
                ours,
                nll_ref[r, s],
                rtol=NLL_RTOL,
                atol=NLL_ATOL,
                err_msg=f"{exp}: NLL mismatch at restart {r} stage {s} "
                f"(gamma={gammas[min(s, len(gammas) - 1)]:.3g})",
            )
            checked += 1
    assert checked > 0, f"{exp}: nothing comparable in reference artifact"


def _check_against_local_artifact(relpath, ref):
    local = REPO / "results" / relpath
    if not local.exists():
        pytest.skip(
            f"no local artifact results/{relpath}; run the matching CLI first"
        )
    ours = _load_h5(local)
    shared = sorted(set(ref) & set(ours))
    assert shared, f"{relpath}: no shared keys ({sorted(ref)} vs {sorted(ours)})"
    stochastic = relpath.parts[0].startswith("pf_")
    for k in shared:
        a, b = np.asarray(ref[k]), np.asarray(ours[k])
        assert a.shape == b.shape, f"{relpath}:{k} shape {a.shape} vs {b.shape}"
        if stochastic and k != "t":
            continue  # particle paths share distribution, not values
        if a.dtype.kind in "fc":
            scale = float(max(1.0, np.abs(b).max()))
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-3 * scale, err_msg=f"{relpath}:{k}"
            )


# --- the hook -------------------------------------------------------------

_ref_root = os.environ.get(REF_ENV)
_found = _collect(_ref_root) if _ref_root else []


@pytest.mark.skipif(
    not _ref_root, reason=f"{REF_ENV} not set (no reference artifacts supplied)"
)
@pytest.mark.parametrize("relpath", _found, ids=[str(p) for p in _found])
def test_reference_artifact_parity(relpath):
    _resolve(relpath, Path(_ref_root))


def test_reference_hook_finds_files():
    if not _ref_root:
        pytest.skip(f"{REF_ENV} not set")
    assert _found, f"{REF_ENV}={_ref_root} contains no .h5 files"


# --- always-on self-test against this repo's own results tree --------------
# Our artifacts use the reference schema, so the same machinery must pass on
# them (with the estimation tolerance widened: the stored nll_optims came
# from f32 TPU optimization runs, re-scored here in f64).


def test_selftest_gt_trajectory():
    if not (REPO / "results/gt/lotkavolterra.h5").exists():
        pytest.skip("no local gt artifact")
    _check_trajectory("gt/lotkavolterra", _load_h5(REPO / "results/gt/lotkavolterra.h5"))


def test_selftest_noise_gt_residual():
    if not (REPO / "results/noise_gt/lotkavolterra.h5").exists():
        pytest.skip("no local noise_gt artifact")
    _check_trajectory(
        "noise_gt/lotkavolterra", _load_h5(REPO / "results/noise_gt/lotkavolterra.h5")
    )


def test_selftest_estimation_nll_rescore(monkeypatch):
    art = REPO / "results/params/lotkavolterra2.h5"
    if not art.exists():
        pytest.skip("no local estimation artifact")
    monkeypatch.setattr(
        sys.modules[__name__], "NLL_RTOL", 5e-3
    )  # f32-optimizer values re-scored in f64
    monkeypatch.setattr(sys.modules[__name__], "NLL_ATOL", 0.5)
    _check_estimation(
        "params/lotkavolterra2", _load_h5(art), REPO / "results", max_rows=2
    )
