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

# f32 same-math/different-schedule envelopes. Values accumulate over the
# full filter horizon; gradients additionally pass through the QR pullback,
# hence the wider bound (matches the interpret-mode tolerances in
# test_pallas_ekf.py).
VAL_RTOL = 5e-3
GRAD_RTOL = 5e-2


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


def test_lv_pallas_matches_xla(probe_records):
    rec = probe_records.get("lv_crosscheck")
    assert rec is not None, sorted(probe_records)
    assert "error" not in rec, rec
    assert rec["rel_err_val"] < VAL_RTOL, rec
    assert rec["rel_err_grad"] < GRAD_RTOL, rec


def test_hh_implicit_pallas_matches_xla(probe_records):
    rec = probe_records.get("hh_pallas_crosscheck")
    assert rec is not None, sorted(probe_records)
    assert "error" not in rec, rec
    assert rec["rel_err_val"] < VAL_RTOL, rec
    assert rec["rel_err_grad"] < GRAD_RTOL, rec
