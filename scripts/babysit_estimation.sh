#!/bin/bash
# Babysits a tempered-estimation run on the flaky remote TPU: retries on
# tunnel/session death, resuming from the per-(chunk x stage) sidecar
# checkpoint until the final H5 lands. Usage:
#   babysit_estimation.sh <experiment> <logfile> [--set k=v ...]
set -u
EXP="$1"; LOG="$2"; shift 2
cd "$(dirname "$0")"
for attempt in $(seq 1 40); do
  SEG="${LOG}.attempt"
  echo "=== attempt $attempt $(date +%T) ===" >> "$LOG"
  timeout 4000 python run_parameter_estimation.py optimize --experiment "$EXP" "$@" > "$SEG" 2>&1
  rc=$?
  cat "$SEG" >> "$LOG"
  # Success only if THIS attempt printed the final summary (the log file
  # accumulates across attempts and may contain stale markers).
  if grep -q "^optimize:" "$SEG"; then
    echo "=== SUCCESS after $attempt attempts $(date +%T) ===" >> "$LOG"
    rm -f "$SEG"
    exit 0
  fi
  # A killed-mid-dispatch client wedges the remote TPU runtime for several
  # minutes; retrying immediately just hangs the next attempt's first
  # dispatch. Wait out the recovery window.
  echo "=== attempt $attempt died rc=$rc; retrying in 240s ===" >> "$LOG"
  sleep 240
done
echo "=== GAVE UP $(date +%T) ===" >> "$LOG"
exit 1
