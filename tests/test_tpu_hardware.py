"""On-hardware kernel parity (round-3 verdict: the Pallas kernels must be
validated on the real TPU every round, as a pytest rather than a
queue-gated script).

The CI conftest pins tests to the virtual CPU mesh, so this test drives
the chip from a clean subprocess (PYTHONPATH keeps the axon sitecustomize
that routes JAX to the remote TPU). It runs the probe's cross-check
subset — deterministic/stiff/HH sanity solves, then the explicit (LV) and
implicit (HH-full) fused Pallas kernels against the XLA reference path —
and asserts the printed JSON records.

Gated on ODEUQ_TPU_TESTS=1: the chip is single-tenant and shared with
long-running estimation clients (claim waits are unbounded), so the CPU
suite must not block on it by default. The round's TPU queue and the
/verify skill set the gate; run manually with

    ODEUQ_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.tpu

REPO = Path(__file__).resolve().parent.parent

# f32 same-math/different-schedule envelopes, per-LANE normalized (each
# lane's error over its own gradient scale) with a p99 headline + a looser
# max bound. Round-4's per-component max metric scored a lane with one
# O(1e-3) gradient component next to an O(1e4) one as a "6.1x" error; the
# round-5 f64 oracle (results/probe_r5.json, scripts/tpu_probe_r5.py
# --mode oracle) showed the Pallas kernel was the MORE accurate path on
# exactly those lanes (grad err vs f64: pallas <=2.1e-3, xla up to 6.3e-2)
# — the crosscheck tail is the XLA path's own checkpoint/chunk-schedule f32
# divergence, so the max bound is set to bound the XLA side's oracle error,
# not the kernel's.
VAL_RTOL = 5e-3
GRAD_RTOL = 5e-2
VAL_RTOL_MAX = 2e-2
GRAD_RTOL_MAX = 1.5e-1


@pytest.fixture(scope="module")
def probe_records():
    if not os.environ.get("ODEUQ_TPU_TESTS"):
        pytest.skip("ODEUQ_TPU_TESTS not set (single-tenant chip; see module docstring)")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize route to the TPU
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/tpu_probe_r3.py"), "--skip", "hh"],
        capture_output=True,
        text=True,
        env=env,
        timeout=int(os.environ.get("ODEUQ_TPU_TEST_TIMEOUT", "2700")),
        cwd=str(REPO),
    )
    # Persist the full probe output: the queue pipes pytest through tail -4,
    # which has twice discarded the crosscheck failure details.
    Path("/tmp/tpu_probe_pytest.out").write_text(out.stdout + "\n--- stderr ---\n" + out.stderr)
    records = {}
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and "probe" in rec:
            records[rec["probe"]] = rec
    Path("/tmp/tpu_probe_records.json").write_text(json.dumps(records, indent=1))
    assert records, f"probe produced no records; tail:\n{(out.stdout + out.stderr)[-2000:]}"
    return records


def test_tpu_sanity_solves(probe_records):
    rec = probe_records.get("verify_tpu")
    assert rec is not None and rec.get("ok"), rec
    assert rec["hh_vmax"] > 0.0  # HH spikes under stimulus


def _assert_crosscheck(rec):
    assert "error" not in rec, rec
    assert rec["rel_err_val"] < VAL_RTOL, rec            # p99, jointly finite
    assert rec["rel_err_grad"] < GRAD_RTOL, rec          # p99, jointly finite
    assert rec["rel_err_val_max"] < VAL_RTOL_MAX, rec
    assert rec["rel_err_grad_max"] < GRAD_RTOL_MAX, rec
    # Random HH-full draws legitimately diverge on some lanes (DESIGN §11d);
    # both paths must flag the same lanes, modulo a small f32
    # schedule-difference boundary band.
    assert rec["finite_mask_mismatch"] <= 0.02 * rec["lanes"], rec
    assert rec["finite_xla"] > 0.5 * rec["lanes"], rec


def test_lv_pallas_matches_xla(probe_records):
    rec = probe_records.get("lv_crosscheck")
    assert rec is not None, sorted(probe_records)
    _assert_crosscheck(rec)


def test_hh_implicit_pallas_matches_xla(probe_records):
    rec = probe_records.get("hh_pallas_crosscheck")
    assert rec is not None, sorted(probe_records)
    _assert_crosscheck(rec)
