"""Host-driven batched L-BFGS (inference/lbfgs_host.py).

The host optimizer is the production estimation path on the remote-TPU
runtime (see module docstring); these tests pin its optimization quality
and its dispatch-economy devices (optimistic unit step, bucket compaction,
stall stop) on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ode_uncertainty_tpu.inference.lbfgs_host import lbfgs_box_host, make_stage_optimizer_host


def _wrap(obj):
    """Builds the batched value_and_grad device callable from a scalar
    objective."""
    vg = jax.jit(jax.vmap(jax.value_and_grad(obj)))

    def vg_b(x):
        return vg(jnp.asarray(x))

    return vg_b


def test_quadratic_batched():
    target = jnp.array([0.3, 0.7, 0.5])

    def obj(p):
        return jnp.sum((p - target) ** 2)

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(0).uniform(0, 1, (17, 3))
    res = lbfgs_box_host(vg_b, x0, f32=False, tol=1e-8)
    assert res.converged.all()
    np.testing.assert_allclose(res.x, np.tile(np.asarray(target), (17, 1)), atol=1e-6)
    # quadratic: quasi-Newton solves it in a few iterations
    assert res.iters.max() <= 20


def test_box_active_constraints():
    # Unconstrained optimum outside the box -> projected optimum at corner.
    def obj(p):
        return jnp.sum((p - 2.0) ** 2)

    vg_b = _wrap(obj)
    res = lbfgs_box_host(vg_b, np.full((4, 2), 0.5), f32=False, tol=1e-8)
    np.testing.assert_allclose(res.x, 1.0, atol=1e-8)
    assert res.converged.all()


def test_rosenbrock_valley():
    def obj(p):
        # Rosenbrock shifted into [0,1]^2: optimum at (0.7, 0.49... scaled)
        a, b = 0.7, 10.0
        return (p[0] - a) ** 2 + b * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(1).uniform(0, 1, (8, 2))
    res = lbfgs_box_host(vg_b, x0, f32=False, tol=1e-8, max_iter=400)
    np.testing.assert_allclose(res.x[:, 0], 0.7, atol=1e-4)
    np.testing.assert_allclose(res.x[:, 1], 0.49, atol=1e-4)


def test_compaction_matches_uncompacted():
    # Mixed-difficulty batch: some lanes converge immediately, others take
    # many iterations -> compaction kicks in. Results must be identical.
    def obj(p):
        return (p[0] - 0.5) ** 2 + 30.0 * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(2).uniform(0, 1, (33, 2))
    x0[::3] = [0.5, 0.25]  # a third of the lanes start at the optimum
    r1 = lbfgs_box_host(vg_b, x0.copy(), f32=False, tol=1e-8, compact=True)
    r2 = lbfgs_box_host(vg_b, x0.copy(), f32=False, tol=1e-8, compact=False)
    np.testing.assert_array_equal(r1.x, r2.x)
    np.testing.assert_array_equal(r1.iters, r2.iters)
    np.testing.assert_array_equal(r1.n_fev, r2.n_fev)


def test_optimistic_step_dispatch_economy():
    # On a well-conditioned quadratic the unit step is accepted every
    # iteration after the first: n_fev stays ~2 per iteration (one vg at
    # the trial; no K-block forwards).
    def obj(p):
        return jnp.sum((p - 0.4) ** 2)

    vg_b = _wrap(obj)
    res = lbfgs_box_host(vg_b, np.full((3, 4), 0.9), f32=False, tol=1e-10)
    assert res.converged.all()
    # 1 initial + ~1 per iteration (unit step accepted; no line-search blocks)
    assert (res.n_fev <= res.iters + 3).all(), (res.n_fev, res.iters)


def test_stall_stop_cuts_flat_grind():
    # f32 slack on a nearly-flat objective: without the stall stop the lane
    # grinds to max_iter taking accepted-but-zero-progress steps.
    def obj(p):
        return 1000.0 + 1e-4 * jnp.sum((p - 0.5) ** 2)

    vg_b = _wrap(obj)
    res = lbfgs_box_host(
        vg_b, np.full((2, 2), 0.9), f32=True, tol=0.0, max_iter=200, stall_iters=5
    )
    assert (res.iters < 50).all(), res.iters


def test_nan_objective_is_linesearch_wall():
    # NaN region acts as a rejected step, not a crash.
    def obj(p):
        v = jnp.sum((p - 0.2) ** 2)
        return jnp.where(p[0] > 0.8, jnp.nan, v)

    vg_b = _wrap(obj)
    x0 = np.array([[0.75, 0.3], [0.3, 0.3]])
    res = lbfgs_box_host(vg_b, x0, f32=False, tol=1e-8)
    assert np.isfinite(res.f).all()
    np.testing.assert_allclose(res.x, 0.2, atol=1e-5)


def test_stage_optimizer_host_recovers_quadratic():
    # Through the stage-optimizer wrapper (gamma-parameterized objective).
    def nll(p, q_sqrt, gamma_sqrt):
        return jnp.sum((p - 0.6) ** 2) * (1.0 + gamma_sqrt)

    stage = make_stage_optimizer_host(nll, jnp.eye(2), max_iter=50, tol=1e-8)
    x0 = np.random.default_rng(3).uniform(0, 1, (5, 2))
    res = stage(x0, 0.01)
    np.testing.assert_allclose(res.x, 0.6, atol=1e-6)


def test_mid_stage_state_resume(tmp_path):
    # Kill the optimizer after 3 iterations (simulated by max_iter=3 with a
    # state file), then resume from the sidecar: the resumed run must pick
    # up at iteration 3 and converge to the same optimum a straight-through
    # run reaches, and the sidecar must be gone after normal completion.
    def obj(p):
        return (p[0] - 0.7) ** 2 + 10.0 * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(5).uniform(0, 1, (6, 2))
    sp = str(tmp_path / "state.npz")

    partial = lbfgs_box_host(
        vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=3, state_path=sp
    )
    import os
    # A max_iter-bounded exit with live lanes KEEPS the sidecar, so a rerun
    # with a raised limit continues mid-stage instead of restarting.
    assert os.path.exists(sp)
    cont = lbfgs_box_host(
        vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400, state_path=sp
    )
    assert cont.converged.all()
    assert (cont.iters >= partial.iters).all()
    assert not os.path.exists(sp)  # all-lanes-done return cleans up

    # Re-create a mid-run state: run 3 iters again, keep the file this time
    # by interrupting via an exception from the progress callback.
    class Stop(Exception):
        pass

    def killer(it, done):
        if it >= 2:
            raise Stop

    with pytest.raises(Stop):
        lbfgs_box_host(
            vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400,
            state_path=sp, progress=killer,
        )
    assert os.path.exists(sp)

    resumed = lbfgs_box_host(
        vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400, state_path=sp
    )
    straight = lbfgs_box_host(vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400)
    assert resumed.converged.all()
    np.testing.assert_allclose(resumed.x, straight.x, atol=1e-6)
    # resumed run did NOT redo the first 3 iterations' dispatches
    assert (resumed.n_fev <= straight.n_fev).all()
    assert not os.path.exists(sp)


def test_stale_sidecar_discarded(tmp_path):
    # A sidecar written for DIFFERENT unit inputs (stale file after a store
    # reset / changed config) must not be restored: the fresh inits win.
    # Likewise a changed history length (ring-buffer shape) or state token.
    def obj(p):
        return (p[0] - 0.7) ** 2 + 10.0 * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    rng = np.random.default_rng(7)
    x0_a = rng.uniform(0, 1, (6, 2))
    x0_b = rng.uniform(0, 1, (6, 2))  # same shape, different values
    sp = str(tmp_path / "state.npz")

    class Stop(Exception):
        pass

    def killer(it, done):
        if it >= 2:
            raise Stop

    with pytest.raises(Stop):
        lbfgs_box_host(
            vg_b, x0_a.copy(), f32=False, tol=1e-8, max_iter=400,
            state_path=sp, progress=killer,
        )
    import os
    assert os.path.exists(sp)

    # Different x0 -> fingerprint mismatch -> fresh start (iterates from 0,
    # and its own first-iteration checkpoint overwrites the stale file).
    from ode_uncertainty_tpu.inference.lbfgs_host import _load_iter_state, _unit_fingerprint

    fp_b = _unit_fingerprint(np.clip(x0_b, 0, 1), "")
    assert _load_iter_state(sp, 10, 6, 2, fp_b) is None
    # Different state token (e.g. another tempering gamma) also mismatches.
    fp_a_tok = _unit_fingerprint(np.clip(x0_a, 0, 1), "gamma=0.5")
    assert _load_iter_state(sp, 10, 6, 2, fp_a_tok) is None
    # Different history length m -> ring shapes mismatch -> discarded.
    fp_a = _unit_fingerprint(np.clip(x0_a, 0, 1), "")
    assert _load_iter_state(sp, 7, 6, 2, fp_a) is None
    # Exact match restores.
    loaded = _load_iter_state(sp, 10, 6, 2, fp_a)
    assert loaded is not None and loaded[0] == 3

    # Legacy sidecar (no fingerprint field) is grandfathered on shape match
    # so in-flight pre-upgrade stages resume.
    with np.load(sp, allow_pickle=False) as z:
        legacy = {k: z[k] for k in z.files if k != "fingerprint"}
    np.savez(str(tmp_path / "legacy"), **legacy)
    assert _load_iter_state(str(tmp_path / "legacy.npz"), 10, 6, 2, fp_a) is not None


def _counting(vg_b):
    """Wraps a batched vg callable, recording every dispatch width."""
    widths = []

    def wrapped(x):
        widths.append(len(x))
        return vg_b(x)

    return wrapped, widths


def test_ladder_reaches_sequential_quality():
    # The ladder search (K trials per dispatch) must reach the same optima
    # as the sequential bracket/zoom search on curved valleys and boxes.
    def obj(p):
        a, b = 0.7, 10.0
        return (p[0] - a) ** 2 + b * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(11).uniform(0, 1, (8, 2))
    res = lbfgs_box_host(vg_b, x0, f32=False, tol=1e-8, max_iter=400, ls_trials=8)
    np.testing.assert_allclose(res.x[:, 0], 0.7, atol=1e-4)
    np.testing.assert_allclose(res.x[:, 1], 0.49, atol=1e-4)

    def obj2(p):
        return jnp.sum((p - 2.0) ** 2)

    res2 = lbfgs_box_host(
        _wrap(obj2), np.full((4, 2), 0.5), f32=False, tol=1e-8, ls_trials=8
    )
    np.testing.assert_allclose(res2.x, 1.0, atol=1e-8)


def test_ladder_dispatch_economy():
    # The point of the ladder: far fewer dispatches than sequential search
    # on problems whose cold lanes need many trial steps, and at most
    # 1 + 3 dispatch rounds per iteration (round 0 single-trial + <=3
    # ladder rounds, each chunked by the width cap).
    def obj(p):
        return (p[0] - 0.5) ** 2 + 100.0 * (p[1] - p[0] ** 2) ** 2

    x0 = np.random.default_rng(12).uniform(0, 1, (16, 2))
    seq_vg, seq_w = _counting(_wrap(obj))
    lad_vg, lad_w = _counting(_wrap(obj))
    r_seq = lbfgs_box_host(seq_vg, x0.copy(), f32=False, tol=1e-8, max_iter=200)
    r_lad = lbfgs_box_host(
        lad_vg, x0.copy(), f32=False, tol=1e-8, max_iter=200, ls_trials=8
    )
    assert np.allclose(r_lad.f, r_seq.f, atol=1e-6)
    # dispatches-per-iteration: sequential pays one per line-search round,
    # the ladder bounds it structurally.
    seq_rate = len(seq_w) / max(r_seq.iters.max(), 1)
    lad_rate = len(lad_w) / max(r_lad.iters.max(), 1)
    assert lad_rate <= seq_rate + 1e-9, (seq_rate, lad_rate)


def test_ladder_width_cap_chunks_and_matches():
    # A small width cap forces the trial matrix into sequential chunks; the
    # math must not change, and no dispatch may exceed max(cap, R)
    # (power-of-2 padding of sub-batch chunks stays below R).
    def obj(p):
        return (p[0] - 0.6) ** 2 + 30.0 * (p[1] - p[0] ** 2) ** 2

    x0 = np.random.default_rng(13).uniform(0, 1, (8, 2))
    wide_vg, wide_w = _counting(_wrap(obj))
    slim_vg, slim_w = _counting(_wrap(obj))
    r_wide = lbfgs_box_host(
        wide_vg, x0.copy(), f32=False, tol=1e-8, ls_trials=8, ls_width_cap=256
    )
    r_slim = lbfgs_box_host(
        slim_vg, x0.copy(), f32=False, tol=1e-8, ls_trials=8, ls_width_cap=8
    )
    np.testing.assert_array_equal(r_wide.x, r_slim.x)
    np.testing.assert_array_equal(r_wide.n_fev, r_slim.n_fev)
    assert max(slim_w) <= 8
    assert max(wide_w) <= 256


def test_ladder_nan_wall():
    def obj(p):
        v = jnp.sum((p - 0.2) ** 2)
        return jnp.where(p[0] > 0.8, jnp.nan, v)

    vg_b = _wrap(obj)
    x0 = np.array([[0.75, 0.3], [0.3, 0.3]])
    res = lbfgs_box_host(vg_b, x0, f32=False, tol=1e-8, ls_trials=8)
    assert np.isfinite(res.f).all()
    np.testing.assert_allclose(res.x, 0.2, atol=1e-5)


def test_ladder_mid_stage_resume(tmp_path):
    # The ladder path shares the sidecar format; a killed ladder run must
    # resume mid-stage and converge identically to a straight-through run.
    def obj(p):
        return (p[0] - 0.7) ** 2 + 10.0 * (p[1] - p[0] ** 2) ** 2

    vg_b = _wrap(obj)
    x0 = np.random.default_rng(14).uniform(0, 1, (6, 2))
    sp = str(tmp_path / "state.npz")

    class Stop(Exception):
        pass

    def killer(it, done):
        if it >= 2:
            raise Stop

    with pytest.raises(Stop):
        lbfgs_box_host(
            vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400,
            ls_trials=8, state_path=sp, progress=killer,
        )
    resumed = lbfgs_box_host(
        vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400,
        ls_trials=8, state_path=sp,
    )
    straight = lbfgs_box_host(
        vg_b, x0.copy(), f32=False, tol=1e-8, max_iter=400, ls_trials=8
    )
    assert resumed.converged.all()
    np.testing.assert_allclose(resumed.x, straight.x, atol=1e-6)


def test_stage_optimizer_batched_nll_path():
    # nll_batched replaces the vmapped objective; results must match the
    # vmapped path exactly (same math, vjp-pulled per-lane gradients).
    def nll(p, q_sqrt, gamma_sqrt):
        return jnp.sum((p - 0.6) ** 2) * (1.0 + gamma_sqrt)

    def nll_b(p_b, gamma_sqrt):
        return jax.vmap(lambda p: nll(p, None, gamma_sqrt))(p_b)

    x0 = np.random.default_rng(4).uniform(0, 1, (5, 2))
    plain = make_stage_optimizer_host(nll, jnp.eye(2), max_iter=50, tol=1e-8)
    batched = make_stage_optimizer_host(
        nll, jnp.eye(2), max_iter=50, tol=1e-8, nll_batched=nll_b
    )
    r1 = plain(x0, 0.01)
    r2 = batched(x0, 0.01)
    np.testing.assert_allclose(r2.x, r1.x, rtol=1e-12)
    np.testing.assert_array_equal(r2.n_fev, r1.n_fev)
