#!/bin/bash
# Round-4 TPU work queue, revision d (supersedes r4c mid-run): reordered so
# every zero-artifact config family lands BEFORE the ~7h 1k-restart north
# star, which resumes losslessly from its per-unit + per-iteration L-BFGS
# sidecars (utils/checkpoint.py, inference/lbfgs_host.py). Rationale: the
# r3 verdict ranks one-artifact-per-family above the north star, and the
# calibration family (its runs all died on the fine-obs-grid alignment bug)
# is only now runnable. Strictly sequential; honors the benchmark's
# exclusive lock (utils/runlock.py). Commits artifacts as they land (the VM
# can be reset between rounds; untracked results are lost).
# Usage: nohup bash tpu_queue_r4d.sh > /tmp/tpu_queue_r4d.log 2>&1 &
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
  git -C .. add results/ 2>/dev/null
  git -C .. diff --cached --quiet 2>/dev/null || git -C .. commit -q -m "$1

No-Verification-Needed: data-artifact-only commit, no source change"
}

trmse() {
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$1" --set float64=true \
    --set parameter_estimates_input="../results/$1.h5"
}

estimation() {
  local exp="$1" log="$2"; shift 2
  say "estimation $exp"
  wait_bench
  STALL_S=${STALL_S_OVR:-1800} ATTEMPT_S=${ATTEMPT_S_OVR:-7200} \
    bash babysit_estimation.sh "$exp" "$log" "$@"
  trmse "$exp"
  commit_results "Artifact: $exp tempered estimation + tRMSE"
  sleep 90
}

# 1. zero-artifact tempering-ablation families (one lv2 point each; the
# reference grid is configs/params_temp_*/lotkavolterra{2,4}.yaml)
for fam in params_temp_low_coarse params_temp_high_coarse \
           params_temp_high_fine params_temp_num_low_coarse \
           params_temp_num_low_fine params_temp_num_high_coarse \
           params_temp_num_high_fine; do
  estimation "$fam/lotkavolterra2" "/tmp/${fam}.log"
done

# 2. calibration family (fixed: obs-alignment tolerance now scales with the
# finer grid; every one of these previously raised in sync_times)
for exp in calibration/rkf45/vanderpol calibration/dopri65/lotkavolterra \
           calibration/rkf45/lorenz calibration/rkf45/lcao; do
  say "run_calibration $exp"
  run_step 3600 python run_calibration.py --experiment "$exp"
  sleep 60
done
commit_results "Artifacts: calibration sweeps (Conrad static-noise vs local-error NLL)"

# 3. on-hardware kernel-parity pytest (HH Pallas kernel now lowers: Kahan
# expm1 replaced the unsupported expm1 primitive)
say "tpu kernel-parity pytest"
run_step 4500 env ODEUQ_TPU_TESTS=1 python -m pytest ../tests/test_tpu_hardware.py -q
sleep 60

# 4. resume the implicit-path 1k-restart north star (BASELINE.md "1k vmapped
# tempered restarts"): picks up from the committed unit sidecar + per-iter
# L-BFGS state; chunks of 256 restarts, 4 stages = 16 units.
say "north star resume: params/hodgkinhuxley2_r4 @ 1024 restarts"
wait_bench
STALL_S=2700 ATTEMPT_S=14400 ODEUQ_LS_WIDTH_CAP=512 bash babysit_estimation.sh \
  params/hodgkinhuxley2_r4 /tmp/hh2r4_1k.log \
  --set num_random_runs=1024 --set restart_chunk=256 \
  --set output=../results/params/hodgkinhuxley2_r4_1k.h5
run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
  --experiment params/hodgkinhuxley2_r4 --set float64=true \
  --set parameter_estimates_input=../results/params/hodgkinhuxley2_r4_1k.h5
run_step 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
  --experiment params/hodgkinhuxley2_r4 \
  --set parameter_estimates_input=../results/params/hodgkinhuxley2_r4_1k.h5
commit_results "Artifact: 1k-restart HH2-r4 north star (implicit path) + tRMSE"
sleep 120

# 5. remaining calibration + trajectory points (family breadth)
for exp in calibration/dopri65/vanderpol calibration/dopri65/lorenz \
           calibration/dopri65/lcao calibration/rkf45/lotkavolterra; do
  say "run_calibration $exp"
  run_step 3600 python run_calibration.py --experiment "$exp"
  sleep 60
done
for exp in ekf_trajectory/dopri65/lorenz pf_trajectory/dopri65/lorenz \
           ekf_trajectory/rkf45/lotkavolterra pf_trajectory/rkf45/lotkavolterra \
           ekf_trajectory/rkf45/vanderpol pf_trajectory/rkf45/vanderpol \
           ekf_trajectory/rkf45/lcao pf_trajectory/rkf45/lcao \
           ekf_trajectory/dopri65/lotkavolterra pf_trajectory/dopri65/lotkavolterra \
           ekf_trajectory/dopri65/vanderpol pf_trajectory/dopri65/vanderpol \
           ekf_trajectory/dopri65/lcao pf_trajectory/dopri65/lcao; do
  say "run_filter $exp"
  run_step 1800 python run_filter.py --experiment "$exp"
  sleep 30
done
commit_results "Artifacts: full calibration + EKF/PF trajectory family coverage"

# 6. hardware probe re-run (Pallas HH now lowers; re-decide ODEUQ_HH_IMPL /
# bench batch from data)
say "tpu_probe_r3"
run_step 14400 python tpu_probe_r3.py
sleep 60

# 7. second ablation points (lv4) + parameter ladder (whatever wall remains)
for fam in params_temp_low_fine params_temp_low_coarse params_temp_high_coarse \
           params_temp_high_fine; do
  estimation "$fam/lotkavolterra4" "/tmp/${fam}_lv4.log"
done
estimation params/lotkavolterra4 /tmp/lv4.log
STALL_S_OVR=2700 ATTEMPT_S_OVR=10800 estimation params/hodgkinhuxley6_r1 /tmp/hh6r1.log
STALL_S_OVR=2700 ATTEMPT_S_OVR=10800 estimation params/hodgkinhuxley2_c2_r4 /tmp/hh2c2r4.log
STALL_S_OVR=2700 ATTEMPT_S_OVR=14400 estimation params/hodgkinhuxley9_r1 /tmp/hh9r1.log

say "queue r4d complete"
