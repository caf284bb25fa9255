#!/bin/bash
# Round-5 TPU queue: drain the verdict-named artifact gaps, cheapest-first
# within each named class (VERDICT r4 "Next round" #3/#4/#5):
#
#   1. params/hodgkinhuxley1_r4      — resume the in-flight cheapest HH row
#   2. lotkavolterra4 core families  — params, params_plus, params_baseline
#      (+ params_baseline/pendulum), all cheap explicit-path rows
#   3. params/hodgkinhuxley2_r4      — restore the DESIGN §7 row lost to the
#      round-4 VM reset
#   4. tempering-ablation LV4 grid   — all 8 params_temp_* families
#   5. params/hodgkinhuxley2_c2_r4   — first multi-compartment artifact
#   6. params_plus/hodgkinhuxley2_r4 — gamma_noise_weights HH variant
#   7. params/hodgkinhuxley6_r1 + 9_r1 — params/ ladder toward 10/12
#   8. 1k-restart north star resume  — accrues committed unit progress
#   9. best-effort extras            — remaining c2 rows, 7_full, plus/baseline
#
# Usage: nohup bash tpu_queue_r5.sh > /tmp/tpu_queue_r5.log 2>&1 &
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
# state) on a 10-minute cadence so a VM reset resumes instead of restarting.
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
  local exp="$1"; shift
  local slug="${exp//\//_}"
  # skip rows that already have a committed H5 (queue restart idempotence)
  if [ -f "../results/${exp}.h5" ]; then
    say "skip $exp (artifact exists)"
    return 0
  fi
  say "estimation $exp"
  wait_bench
  bash babysit_estimation.sh "$exp" "/tmp/${slug}.log" "$@"
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$exp" --set float64=true
  run_step 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
    --experiment "$exp"
  run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
  commit_results "Artifact: $exp tempered estimation + tRMSE"
  sleep 30
}

baseline_estimate() {
  local exp="$1"; shift
  if [ -f "../results/${exp}.h5" ]; then
    say "skip $exp (artifact exists)"
    return 0
  fi
  say "baseline estimation $exp"
  wait_bench
  SCRIPT=run_parameter_estimation_baseline.py STALL_S=1800 ATTEMPT_S=7200 \
    bash babysit_estimation.sh "$exp" "/tmp/${exp//\//_}.log"
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$exp" --set float64=true
  run_step 600 env ODEUQ_PLATFORM=cpu python results_inventory.py
  commit_results "Artifact: $exp filter-free baseline estimation + tRMSE"
  sleep 30
}

# 1. finish the in-flight cheapest HH row
STALL_S=1800 ATTEMPT_S=7200 estimate params/hodgkinhuxley1_r4

# 2. lotkavolterra4 core families + cheap baseline rows
STALL_S=1800 ATTEMPT_S=7200 estimate params/lotkavolterra4
STALL_S=1800 ATTEMPT_S=7200 estimate params_plus/lotkavolterra4
baseline_estimate params_baseline/lotkavolterra4
baseline_estimate params_baseline/pendulum
STALL_S=1800 ATTEMPT_S=7200 estimate params_plus/pendulum

# 3. restore the DESIGN §7 row lost to the round-4 reset
STALL_S=1800 ATTEMPT_S=10800 estimate params/hodgkinhuxley2_r4

# 4. tempering-ablation LV4 grid (completes every params_temp_* family 2/2)
for fam in params_temp_low_coarse params_temp_low_fine \
           params_temp_high_coarse params_temp_high_fine \
           params_temp_num_low_coarse params_temp_num_low_fine \
           params_temp_num_high_coarse params_temp_num_high_fine; do
  STALL_S=1800 ATTEMPT_S=7200 estimate "$fam/lotkavolterra4"
done

# 5-7. HH ladder: multi-compartment first-of-class, params_plus variant,
# then the params/ ladder toward 10/12
STALL_S=2700 ATTEMPT_S=14400 estimate params/hodgkinhuxley2_c2_r4
STALL_S=1800 ATTEMPT_S=10800 estimate params_plus/hodgkinhuxley2_r4
STALL_S=1800 ATTEMPT_S=10800 estimate params/hodgkinhuxley6_r1
STALL_S=1800 ATTEMPT_S=10800 estimate params/hodgkinhuxley9_r1

# 8. 1k-restart north star resume (BASELINE.md protocol; sidecars committed
# by the global committer above, so progress accrues even if unfinished)
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

# 9. best-effort extras, cheapest plausible first
STALL_S=2700 ATTEMPT_S=14400 estimate params/hodgkinhuxley3_c2_r4
STALL_S=2700 ATTEMPT_S=14400 estimate params/hodgkinhuxley6_c2_r1
STALL_S=2700 ATTEMPT_S=14400 estimate params/hodgkinhuxley7_full
STALL_S=1800 ATTEMPT_S=10800 estimate params_plus/hodgkinhuxley1_r4
baseline_estimate params_baseline/hodgkinhuxley2_r4
baseline_estimate params_baseline/hodgkinhuxley1_r4

say "queue r5 complete"
