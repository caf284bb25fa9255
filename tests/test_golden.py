"""Golden-snapshot regression tests (VERDICT round-1 item 7).

The reference cannot execute in this environment (its pinned diffrax/jaxopt
stack is not installed), so the framework pins its own f64 CPU outputs —
trajectories for every model family and filter-NLL value+gradient for the
two estimation anchors — in ``tests/golden/*.npz``. Any refactor of the
solvers/models/filters must reproduce them bit-for-bit up to library-level
floating drift.

Regenerate (only after intentional numerics changes, with justification in
the commit message): ``python tests/golden/generate.py``.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).resolve().parent / "golden"
sys.path.insert(0, str(GOLDEN))

import generate  # noqa: E402  (tests/golden/generate.py)

_CASES = {c[0]: c for c in generate.trajectory_cases()}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_trajectory_matches_golden(name):
    _, m, sol, x0, t0, num_steps, save_every = _CASES[name]
    from ode_uncertainty_tpu import solvers

    snap = np.load(GOLDEN / f"traj_{name}.npz")
    x0j = m.build_initial_value(jnp.asarray(x0, jnp.float64), m.params).astype(jnp.float64)
    traj = solvers.solve(sol, m, t0, x0j, num_steps, save_every=save_every)
    np.testing.assert_allclose(np.asarray(traj["t"]), snap["t"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj["x"]), snap["x"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj["eps"]), snap["eps"], rtol=1e-6, atol=1e-14)


@pytest.mark.parametrize("family", ["lotkavolterra2", "hodgkinhuxley2_r4"])
def test_nll_value_and_grad_match_golden(family):
    snap = np.load(GOLDEN / f"nll_{family}.npz")
    nll, p, q_sqrt, gamma_sqrt = generate.nll_rig(family)
    np.testing.assert_allclose(np.asarray(p, np.float64), snap["p"], rtol=0, atol=0)
    val, grad = jax.value_and_grad(lambda pp: nll(pp, q_sqrt, gamma_sqrt))(p)
    np.testing.assert_allclose(float(val), float(snap["nll"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(grad), snap["grad"], rtol=1e-6, atol=1e-12)
