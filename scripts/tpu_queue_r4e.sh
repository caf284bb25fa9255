#!/bin/bash
# Round-4 TPU queue, revision e: resumes r4d after a VM reset killed it at
# the end of step 2 (tempering-ablation LV2 points + the first four
# calibration sweeps landed and are committed; steps 3-7 never ran).
#
# Ordering for the remaining wall:
#   1. on-hardware kernel-parity pytest (bounded; persists the probe JSON
#      into results/ so the evidence survives resets — round-3 verdict #4)
#   2. remaining calibration + EKF/PF trajectory points (cheap breadth)
#   3. the 1k-restart north star resume (verdict #5). It checkpoints per
#      unit AND per L-BFGS iteration; a committer loop force-commits the
#      sidecars every 15 min so another reset cannot destroy progress.
#   4. leftover params ladder if wall remains.
#
# Strictly sequential (single host core; see CLAUDE.md on 15x starvation).
# Honors the benchmark's exclusive lock (utils/runlock.py).
# Usage: nohup bash tpu_queue_r4e.sh > /tmp/tpu_queue_r4e.log 2>&1 &
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

trmse() {
  local inp=${2:-"../results/$1.h5"}
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$1" --set float64=true \
    --set parameter_estimates_input="$inp"
}

# 1. on-hardware kernel-parity pytest; persist the probe records into the
# repo (the fixture writes them to /tmp, which resets wipe).
say "tpu kernel-parity pytest"
run_step 4500 env ODEUQ_TPU_TESTS=1 python -m pytest ../tests/test_tpu_hardware.py -q
if [ -f /tmp/tpu_probe_records.json ]; then
  cp /tmp/tpu_probe_records.json ../results/probe_r4.json
  commit_results "Persist round-4 on-hardware kernel-parity probe records"
fi
sleep 60

# 2a. calibration points — ALL 8: the four committed sweeps were scored
# against the old f32 gt trajectories; gt/ is now f64 (commit d8f854b), so
# the whole family is re-run against the corrected observations.
for exp in calibration/dopri65/vanderpol calibration/dopri65/lorenz \
           calibration/dopri65/lcao calibration/rkf45/lotkavolterra \
           calibration/rkf45/lorenz calibration/rkf45/vanderpol \
           calibration/rkf45/lcao calibration/dopri65/lotkavolterra; do
  say "run_calibration $exp"
  run_step 3600 python run_calibration.py --experiment "$exp"
  sleep 30
done
commit_results "Artifacts: full calibration family (8/8) on f64 ground truth"

# 2b. remaining EKF/PF trajectory points
for exp in ekf_trajectory/dopri65/lorenz pf_trajectory/dopri65/lorenz \
           ekf_trajectory/rkf45/lotkavolterra pf_trajectory/rkf45/lotkavolterra \
           ekf_trajectory/rkf45/vanderpol pf_trajectory/rkf45/vanderpol \
           ekf_trajectory/rkf45/lcao pf_trajectory/rkf45/lcao \
           ekf_trajectory/dopri65/lotkavolterra pf_trajectory/dopri65/lotkavolterra \
           ekf_trajectory/dopri65/vanderpol pf_trajectory/dopri65/vanderpol \
           ekf_trajectory/dopri65/lcao pf_trajectory/dopri65/lcao; do
  say "run_filter $exp"
  run_step 1800 python run_filter.py --experiment "$exp"
  sleep 20
done
run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
commit_results "Artifacts: full EKF/PF trajectory family coverage (8/8 each)"

# 3. the 1k-restart north star (BASELINE.md "1k vmapped tempered restarts"):
# resumes from the committed unit sidecar (2/16 units done). A background
# committer force-commits the per-unit AND per-iteration sidecars every
# 15 min so a VM reset loses at most one L-BFGS iteration.
say "north star resume: params/hodgkinhuxley2_r4 @ 1024 restarts"
wait_bench
(
  while true; do
    sleep 900
    git -C .. add -f results/params/hodgkinhuxley2_r4_1k.h5.units.npz \
      results/params/hodgkinhuxley2_r4_1k.h5.lbfgs-*.npz 2>/dev/null
    git -C .. diff --cached --quiet 2>/dev/null || git -C .. commit -q -m \
      "North-star progress checkpoint (units + L-BFGS sidecars)

No-Verification-Needed: data-artifact-only commit, no source change"
  done
) &
COMMITTER=$!
STALL_S=2700 ATTEMPT_S=14400 ODEUQ_LS_WIDTH_CAP=512 bash babysit_estimation.sh \
  params/hodgkinhuxley2_r4 /tmp/hh2r4_1k.log \
  --set num_random_runs=1024 --set restart_chunk=256 \
  --set output=../results/params/hodgkinhuxley2_r4_1k.h5
kill "$COMMITTER" 2>/dev/null
trmse params/hodgkinhuxley2_r4 ../results/params/hodgkinhuxley2_r4_1k.h5
run_step 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
  --experiment params/hodgkinhuxley2_r4 \
  --set parameter_estimates_input=../results/params/hodgkinhuxley2_r4_1k.h5
run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
commit_results "Artifact: 1k-restart HH2-r4 north star (implicit path) + tRMSE"
sleep 120

# 4. leftover params ladder (only reached if the north star finishes early)
for fam in params_temp_low_fine params_temp_low_coarse params_temp_high_coarse \
           params_temp_high_fine; do
  say "estimation $fam/lotkavolterra4"
  wait_bench
  STALL_S=1800 ATTEMPT_S=7200 bash babysit_estimation.sh \
    "$fam/lotkavolterra4" "/tmp/${fam}_lv4.log"
  trmse "$fam/lotkavolterra4"
  commit_results "Artifact: $fam/lotkavolterra4 tempered estimation + tRMSE"
  sleep 90
done
say "queue r4e complete"
