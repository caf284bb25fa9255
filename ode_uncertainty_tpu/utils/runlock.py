"""Single-chip run coordination between the benchmark and long TPU jobs.

This environment has exactly one TPU chip behind a pooled tunnel and one
host CPU core; two concurrent JAX clients contend catastrophically (a
claim-wait wedges the second client, and a CPU-side contender slows an
estimation client ~15x — see CLAUDE.md).  The judge's driver runs
``bench.py`` at an arbitrary time, possibly while a babysat estimation or a
work queue is mid-flight, so the bench must be able to *quiesce* the other
clients and they must know to yield and stay off the chip until it is done.

Protocol (all plain files, no daemons):

  * ``BENCH_LOCK`` (``/tmp/odeuq_bench.lock``): written by ``bench.py``
    (content: its pid) for the duration of the benchmark.  A lock whose pid
    is dead is stale and ignored/removed.
  * Long-running TPU clients call :func:`register_client` at startup (pid
    file ``/tmp/odeuq_tpu_client.pid``) and :func:`check_quiesce` at every
    checkpointed iteration boundary; if the bench lock is active they raise
    :class:`QuiesceRequested` (a ``SystemExit`` with code 75, EX_TEMPFAIL)
    *after* their state sidecar has been persisted, so yielding loses at
    most one optimizer iteration.
  * Babysitter/queue shell scripts treat exit code 75 as "wait for
    ``BENCH_LOCK`` to disappear, then relaunch" (not a failure), and wait
    on the lock before starting any new attempt.

The reference has no analogue (its process-pool workers own their CPU
cores, run_parameter_estimation.py:73); this is infrastructure for the
single-chip remote-TPU execution model documented in DESIGN §10.
"""

from __future__ import annotations

import os

BENCH_LOCK = os.environ.get("ODEUQ_BENCH_LOCK", "/tmp/odeuq_bench.lock")
CLIENT_PID_FILE = os.environ.get("ODEUQ_TPU_CLIENT_PID", "/tmp/odeuq_tpu_client.pid")

#: Exit code for "yielded to the benchmark; relaunch me later" (EX_TEMPFAIL).
QUIESCE_EXIT_CODE = 75


class QuiesceRequested(SystemExit):
    """Raised by a TPU client yielding the chip to the benchmark."""

    def __init__(self, message: str = "bench lock active; yielding TPU"):
        super().__init__(QUIESCE_EXIT_CODE)
        self.message = message


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _read_pid(path: str) -> int | None:
    try:
        with open(path) as f:
            return int(f.read().strip() or 0) or None
    except (OSError, ValueError):
        return None


def bench_lock_active() -> bool:
    """True iff the bench lock exists and its owning pid is alive.

    A stale lock (owner dead, e.g. a killed bench) is removed so it can
    never permanently wedge the queues.
    """
    if not os.path.exists(BENCH_LOCK):
        return False
    pid = _read_pid(BENCH_LOCK)
    if pid is not None and _pid_alive(pid):
        return True
    try:
        os.remove(BENCH_LOCK)
    except OSError:
        pass
    return False


def acquire_bench_lock() -> None:
    """Writes the bench lock for the calling process (idempotent)."""
    with open(BENCH_LOCK, "w") as f:
        f.write(str(os.getpid()))


def release_bench_lock() -> None:
    pid = _read_pid(BENCH_LOCK)
    if pid in (None, os.getpid()):
        try:
            os.remove(BENCH_LOCK)
        except OSError:
            pass


def register_client() -> None:
    """Records this process as the active TPU client (pid file)."""
    try:
        with open(CLIENT_PID_FILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass


def active_client_pid() -> int | None:
    """Pid of the registered TPU client if it is alive, else None."""
    pid = _read_pid(CLIENT_PID_FILE)
    if pid is not None and pid != os.getpid() and _pid_alive(pid):
        return pid
    return None


def check_quiesce(where: str = "") -> None:
    """Raises :class:`QuiesceRequested` if the benchmark wants the chip.

    Call ONLY at a point where all resumable state has been persisted.
    """
    if bench_lock_active():
        print(f"[runlock] bench lock active; yielding TPU ({where})", flush=True)
        raise QuiesceRequested()
