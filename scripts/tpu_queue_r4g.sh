#!/bin/bash
# Round-4 TPU queue, revision g: post-reset continuation of r4f, reordered so
# the verdict-named gaps land first, and with a global sidecar committer so a
# VM reset mid-step loses at most ~10 minutes of optimizer work (r4f lost its
# entire first step to the 2026-08-19 reset because unit sidecars are
# gitignored and nothing force-committed them outside the north-star step).
#
#   1. params/hodgkinhuxley1_r4      — cheapest HH estimation problem
#   2. params/lotkavolterra4         — 4-param LV (params family)
#   3. params/hodgkinhuxley2_c2_r4   — multi-compartment estimation (the one
#      named zero-artifact class left from the round-3 verdict)
#   4. params_plus/hodgkinhuxley2_r4 — gamma_noise_weights variant on HH
#   5. params/hodgkinhuxley2_r4      — restore the round-3 artifact lost to
#      the earlier VM reset under its canonical name (DESIGN §7 row)
#   6. params_baseline LV4+pendulum  — filter-free protocol, cheap
#   7. params_temp_num_*/lotkavolterra4 — remaining tempering-ablation grid
#   8. resume the 1k-restart north star (accrues committed unit progress)
#
# Usage: nohup bash tpu_queue_r4g.sh > /tmp/tpu_queue_r4g.log 2>&1 &
set -u
cd "$(dirname "$0")"
BENCH_LOCK=${ODEUQ_BENCH_LOCK:-/tmp/odeuq_bench.lock}

say() { echo "=== $(date +%T) $*"; }

bench_active() {
  [ -f "$BENCH_LOCK" ] && kill -0 "$(cat "$BENCH_LOCK" 2>/dev/null)" 2>/dev/null
}

wait_bench() {
  while bench_active; do
    say "bench lock active; holding off"
    sleep 30
  done
}

run_step() {
  local t="$1"; shift
  for try in 1 2; do
    wait_bench
    timeout "$t" "$@" 2>&1 | tail -4
    local rc=${PIPESTATUS[0]}
    [ "$rc" = "75" ] || return "$rc"
    say "step yielded to bench; retrying"
  done
}

commit_results() {
  git -C .. add results/ docs/ 2>/dev/null
  git -C .. diff --cached --quiet 2>/dev/null || git -C .. commit -q -m "$1

No-Verification-Needed: data-artifact-only commit, no source change"
}

# Force-commit every estimation sidecar (unit grids + per-iteration L-BFGS
# state) on a 10-minute cadence for the lifetime of the queue, so any reset
# resumes instead of restarting. Sidecars are gitignored by design — hence
# the add -f.
(
  while true; do
    sleep 600
    git -C .. add -f results/*/*.h5.units.npz results/*/*.h5.lbfgs-*.npz 2>/dev/null
    git -C .. diff --cached --quiet 2>/dev/null || git -C .. commit -q -m \
      "Estimation progress checkpoint (unit + L-BFGS sidecars)

No-Verification-Needed: data-artifact-only commit, no source change"
  done
) &
COMMITTER=$!
trap 'kill "$COMMITTER" 2>/dev/null' EXIT

estimate() {
  # estimate <experiment> [babysit extra args...]
  local exp="$1"; shift
  local slug="${exp//\//_}"
  say "estimation $exp"
  wait_bench
  bash babysit_estimation.sh "$exp" "/tmp/${slug}.log" "$@"
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$exp" --set float64=true
  run_step 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
    --experiment "$exp"
  run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
  commit_results "Artifact: $exp tempered estimation + tRMSE"
  sleep 60
}

# 1-2. cheap params-family problems
STALL_S=1800 ATTEMPT_S=7200 estimate params/hodgkinhuxley1_r4
STALL_S=1800 ATTEMPT_S=7200 estimate params/lotkavolterra4

# 3. multi-compartment estimation (verdict: zero c2 artifacts so far)
STALL_S=2700 ATTEMPT_S=14400 estimate params/hodgkinhuxley2_c2_r4

# 4. params_plus variant on an HH problem
STALL_S=1800 ATTEMPT_S=10800 estimate params_plus/hodgkinhuxley2_r4

# 5. canonical 100-restart HH2-r4 (round-3 artifact lost to the reset)
STALL_S=1800 ATTEMPT_S=10800 estimate params/hodgkinhuxley2_r4

# 6. filter-free baseline protocol (no tempering, single stage)
for exp in params_baseline/lotkavolterra4 params_baseline/pendulum; do
  say "baseline estimation $exp"
  wait_bench
  SCRIPT=run_parameter_estimation_baseline.py STALL_S=1800 ATTEMPT_S=7200 \
    bash babysit_estimation.sh "$exp" "/tmp/${exp//\//_}.log"
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$exp" --set float64=true
  run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
  commit_results "Artifact: $exp filter-free baseline estimation + tRMSE"
  sleep 60
done

# 7. remaining tempering-ablation LV4 points
for fam in params_temp_num_low_coarse params_temp_num_low_fine \
           params_temp_num_high_coarse params_temp_num_high_fine; do
  STALL_S=1800 ATTEMPT_S=7200 estimate "$fam/lotkavolterra4"
done

# 8. resume the 1k-restart north star (BASELINE.md "1k vmapped tempered
# restarts"); the global committer above already persists its sidecars.
say "north star resume: params/hodgkinhuxley2_r4 @ 1024 restarts"
wait_bench
STALL_S=2700 ATTEMPT_S=14400 ODEUQ_LS_WIDTH_CAP=512 bash babysit_estimation.sh \
  params/hodgkinhuxley2_r4 /tmp/hh2r4_1k.log \
  --set num_random_runs=1024 --set restart_chunk=256 \
  --set output=../results/params/hodgkinhuxley2_r4_1k.h5
run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
  --experiment params/hodgkinhuxley2_r4 --set float64=true \
  --set parameter_estimates_input=../results/params/hodgkinhuxley2_r4_1k.h5
run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
commit_results "Artifact: 1k-restart HH2-r4 north star (implicit path) + tRMSE"

say "queue r4g complete"
