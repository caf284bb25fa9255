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
    run_chunked,
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


def test_run_chunked_resume(tmp_path):
    out = str(tmp_path / "res.h5")
    calls = []

    def run_chunk(start, stop):
        calls.append((start, stop))
        if len(calls) == 3 and not getattr(run_chunk, "resumed", False):
            raise RuntimeError("simulated crash")
        return {"x": np.arange(start, stop, dtype=np.float64)}

    try:
        run_chunked(out, 10, 3, run_chunk)
    except RuntimeError:
        pass
    # crash after 2 completed chunks; resume runs only the remaining ones
    run_chunk.resumed = True
    calls.clear()
    merged = run_chunked(out, 10, 3, run_chunk)
    assert calls == [(6, 9), (9, 10)]
    np.testing.assert_array_equal(merged["x"], np.arange(10))
    # checkpoint sidecar removed on success
    import pathlib

    assert not pathlib.Path(out + ".ckpt.npz").exists()


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
