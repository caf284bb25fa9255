"""Utility subsystem tests: H5 IO roundtrip, checkpoint/resume, profiling,
NaN detection."""

import numpy as np
import jax
import jax.numpy as jnp

from ode_uncertainty_tpu.utils import (
    PhaseTimer,
    benchmark,
    count_nonfinite,
    load_data,
    run_stage_grid,
    store_data,
)


def test_h5_roundtrip(tmp_path):
    p = str(tmp_path / "out.h5")
    data = {"a": np.arange(6).reshape(2, 3), "t": np.linspace(0, 1, 5), "prng_key": np.zeros(2)}
    store_data(data, p)
    back = load_data(p)
    assert "prng_key" not in back  # skipped like the reference
    np.testing.assert_array_equal(back["a"], data["a"])
    # append mode replaces keys
    store_data({"a": np.ones((2, 3))}, p, mode="a")
    back = load_data(p)
    np.testing.assert_array_equal(back["a"], np.ones((2, 3)))
    np.testing.assert_array_equal(back["t"], data["t"])


def test_run_stage_grid_resume(tmp_path):
    """Per-(chunk x stage) checkpointing: a crash mid-sweep loses at most one
    unit; the resumed run skips completed units and merges identically."""
    import pathlib
    from types import SimpleNamespace

    out = str(tmp_path / "res.h5")
    p0 = np.linspace(0.1, 0.9, 10)[:, None]  # [R=10, P=1]
    gammas = np.array([1e-2, 0.0])
    calls = []

    def make_stage(crash_at=None):
        def stage(p, gamma):
            calls.append((float(np.asarray(p)[0, 0]), float(gamma)))
            if crash_at is not None and len(calls) == crash_at:
                raise RuntimeError("simulated crash")
            x = np.asarray(p) * 0.5 + gamma
            return SimpleNamespace(
                x=x,
                f=np.sum(x, axis=1),
                iters=np.full(x.shape[0], 3, np.int32),
                n_fev=np.full(x.shape[0], 7, np.int32),
            )

        return stage

    logs = []
    try:
        run_stage_grid(out, p0, gammas, make_stage(crash_at=3), lambda z: z * 10,
                       chunk=4, tag="t", log=logs.append)
    except RuntimeError:
        pass
    assert pathlib.Path(out + ".units.npz").exists()
    n_before = len(calls)
    calls.clear()
    merged = run_stage_grid(out, p0, gammas, make_stage(), lambda z: z * 10,
                            chunk=4, tag="t", log=logs.append)
    # 3 chunks x 2 stages = 6 units; 2 done before the crash
    assert n_before == 3 and len(calls) == 4
    assert merged["params_optims"].shape == (10, 2, 1)
    assert np.isfinite(merged["nll_optims"]).all()
    # stage 1 result feeds stage 2: x2 = (x1*0.5 + g1)*0.5 + 0
    expect1 = p0 * 0.5 + gammas[0]
    np.testing.assert_allclose(merged["params_optims"][:, 1], expect1 * 0.5 * 10)
    assert not pathlib.Path(out + ".units.npz").exists()
    assert any("ETA" in line for line in logs)


def test_count_nonfinite():
    tree = {"a": jnp.array([1.0, jnp.nan]), "b": jnp.array([jnp.inf, 2.0, 3.0]), "i": jnp.arange(3)}
    assert int(count_nonfinite(tree)) == 2
    assert int(count_nonfinite({"a": jnp.ones(4)})) == 0


def test_phase_timer_and_benchmark():
    timer = PhaseTimer()
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    with timer.phase("matmul", sync=f(x)):
        pass
    assert "matmul" in timer.report()

    compile_s, steady_s = benchmark(f, x, reps=3)
    assert compile_s >= 0 and steady_s >= 0
