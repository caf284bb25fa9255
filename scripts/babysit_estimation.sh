#!/bin/bash
# Babysits a tempered-estimation run on the flaky remote TPU: retries on
# tunnel/session death, resuming from the per-(chunk x stage) sidecar
# checkpoint AND the per-iteration L-BFGS state sidecar until the final H5
# lands. Usage:
#   babysit_estimation.sh <experiment> <logfile> [--set k=v ...]
#
# Two failure modes need different watchdogs:
#   * wedged client: a client launched into a recovering runtime can park
#     forever in backend init with zero output (observed: futex wait, no
#     TCP to the relay, 2 s CPU in 20 min). STALL_S kills an attempt whose
#     log hasn't grown in that window.
#   * long healthy stages: implicit-solver stages legitimately run for
#     hours; with iteration-granular state checkpointing (lbfgs_host) a
#     kill only loses the current iteration, so ATTEMPT_S bounds runaway
#     attempts without losing work.
#
# Bench coordination (utils/runlock.py): the judge's bench.py takes
# /tmp/odeuq_bench.lock and needs the chip + host core to itself. The
# client yields with exit code 75 at its next checkpointed iteration; we
# then wait for the lock to clear and relaunch (resuming mid-stage), and
# never start a new attempt while the lock is held.
set -u
EXP="$1"; LOG="$2"; shift 2
cd "$(dirname "$0")"
STALL_S=${STALL_S:-900}
ATTEMPT_S=${ATTEMPT_S:-10800}
BENCH_LOCK=${ODEUQ_BENCH_LOCK:-/tmp/odeuq_bench.lock}
# SCRIPT: the estimation entrypoint; params_baseline/ experiments use the
# filter-free protocol script (run_parameter_estimation_baseline.py).
SCRIPT=${SCRIPT:-run_parameter_estimation.py}

bench_active() {
  [ -f "$BENCH_LOCK" ] && kill -0 "$(cat "$BENCH_LOCK" 2>/dev/null)" 2>/dev/null
}

wait_bench() {
  while bench_active; do
    echo "=== bench lock active; holding off $(date +%T) ===" >> "$LOG"
    sleep 30
  done
}

for attempt in $(seq 1 60); do
  wait_bench
  SEG="${LOG}.attempt"
  echo "=== attempt $attempt $(date +%T) ===" >> "$LOG"
  : > "$SEG"
  python "$SCRIPT" optimize --experiment "$EXP" "$@" > "$SEG" 2>&1 &
  PY=$!
  started=$(date +%s)
  rc=""
  while true; do
    sleep 30
    if ! kill -0 "$PY" 2>/dev/null; then
      wait "$PY"; rc=$?
      break
    fi
    now=$(date +%s)
    age=$(( now - $(stat -c %Y "$SEG") ))
    total=$(( now - started ))
    if [ "$age" -ge "$STALL_S" ]; then
      echo "=== watchdog: no output in ${age}s, killing attempt ===" >> "$LOG"
      kill "$PY" 2>/dev/null; sleep 5; kill -9 "$PY" 2>/dev/null
      rc=99
      break
    fi
    if [ "$total" -ge "$ATTEMPT_S" ]; then
      echo "=== watchdog: attempt exceeded ${ATTEMPT_S}s, recycling ===" >> "$LOG"
      kill "$PY" 2>/dev/null; sleep 5; kill -9 "$PY" 2>/dev/null
      rc=98
      break
    fi
  done
  cat "$SEG" >> "$LOG"
  # Success only if THIS attempt printed the final summary (the log file
  # accumulates across attempts and may contain stale markers).
  if grep -qE "^(baseline )?optimize:" "$SEG"; then
    echo "=== SUCCESS after $attempt attempts $(date +%T) ===" >> "$LOG"
    rm -f "$SEG"
    exit 0
  fi
  # rc 75 = clean yield to the benchmark (state checkpointed); not a
  # failure, no recovery window needed — just wait out the lock.
  if [ "$rc" = "75" ]; then
    echo "=== attempt $attempt yielded to bench; will resume ===" >> "$LOG"
    continue
  fi
  # A killed-mid-dispatch client wedges the remote TPU runtime for several
  # minutes; retrying immediately just hangs the next attempt's first
  # dispatch. Wait out the recovery window.
  echo "=== attempt $attempt died rc=$rc; retrying in 300s ===" >> "$LOG"
  sleep 300
done
echo "=== GAVE UP $(date +%T) ===" >> "$LOG"
exit 1
