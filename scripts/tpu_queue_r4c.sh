#!/bin/bash
# Round-4 TPU work queue, revision c (replaces tpu_queue_r4.sh + r4b while
# both were still parked at their wait step): with the ladder line search
# landed (DESIGN §8b) the LV2-scale estimation families run ~5x faster, so
# the zero-artifact families (VERDICT r3 missing #3) are front-loaded ahead
# of the long-bounded hardware probe, and the big HH ladder points take
# whatever wall-clock remains. Strictly sequential — the remote runtime
# takes one client at a time (DESIGN §10) — and honors the benchmark's
# exclusive lock (utils/runlock.py).
# Usage: nohup bash tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
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

# run_step <timeout_s> <cmd...>: lock-aware direct step; one retry after a
# bench yield (rc 75), tail-filtered output.
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

trmse() {
  run_step 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$1" --set float64=true \
    --set parameter_estimates_input="../results/$1.h5"
}

report() {
  run_step 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
    --experiment "$1" --set parameter_estimates_input="../results/$1.h5"
}

# estimation <experiment> <log> [extra --set args...]: babysat tempered
# estimation + tRMSE close-out.
estimation() {
  local exp="$1" log="$2"; shift 2
  say "estimation $exp"
  wait_bench
  STALL_S=${STALL_S_OVR:-1800} ATTEMPT_S=${ATTEMPT_S_OVR:-7200} \
    bash babysit_estimation.sh "$exp" "$log" "$@"
  trmse "$exp"
  sleep 120
}

# 0. wait for the flagship babysitter's terminal marker.
if [ -f /tmp/hhfull_babysit.pid ] && kill -0 "$(cat /tmp/hhfull_babysit.pid)" 2>/dev/null; then
  say "waiting for flagship babysitter"
  while ! grep -qE "=== (SUCCESS|GAVE UP)" /tmp/hhfull_r4.log 2>/dev/null; do
    if ! kill -0 "$(cat /tmp/hhfull_babysit.pid)" 2>/dev/null; then
      say "babysitter gone without terminal marker; proceeding"
      break
    fi
    sleep 60
  done
fi
say "flagship done; cooling down 120s (runtime recovery window)"
sleep 120

# 1. flagship close-out: tRMSE + recovery table (CPU f64; light)
say "compute_trmse hodgkinhuxley11_full"
trmse params/hodgkinhuxley11_full
report params/hodgkinhuxley11_full

# 2. LV2 re-run on the shipped strong-Wolfe optimizer (the committed
# artifact predates it; VERDICT r3 weak #4).
if [ -f ../results/params/lotkavolterra2.h5 ]; then
  mv -n ../results/params/lotkavolterra2.h5 ../results/params/lotkavolterra2_r2armijo.h5
  rm -f ../results/params/lotkavolterra2.h5.ckpt.npz ../results/params/lotkavolterra2.h5.lbfgs-*.npz
fi
estimation params/lotkavolterra2 /tmp/lv2_r4.log
report params/lotkavolterra2

# 3. trajectory families (EKF/PF on chaotic Lorenz) — fast filter runs
for exp in ekf_trajectory/rkf45/lorenz pf_trajectory/rkf45/lorenz; do
  say "run_filter $exp"
  run_step 1800 python run_filter.py --experiment "$exp"
  sleep 60
done

# 4. calibration sweep (the thesis's Conrad-comparison centerpiece)
say "run_calibration calibration/rkf45/vanderpol"
run_step 3600 python run_calibration.py --experiment calibration/rkf45/vanderpol
sleep 60

# 5. zero-artifact LV2-scale estimation families (ladder-accelerated)
estimation params_plus/lotkavolterra2 /tmp/lv2_plus.log

say "params_baseline/lotkavolterra2"
wait_bench
STALL_S=1800 ATTEMPT_S=7200 SCRIPT=run_parameter_estimation_baseline.py \
  bash babysit_estimation.sh \
  params_baseline/lotkavolterra2 /tmp/lv2_baseline.log
trmse params_baseline/lotkavolterra2
sleep 120

estimation params/pendulum /tmp/pendulum.log
estimation params_temp_low_fine/lotkavolterra2 /tmp/lv2_temp.log

# 6. NLL landscape grid (evaluate subcommand's first real artifact)
say "evaluate landscape params/lotkavolterra2"
run_step 5400 python run_parameter_estimation.py evaluate \
  --experiment params/lotkavolterra2
sleep 60

# 7. hardware probe (bench-batch crash boundary, Pallas-vs-XLA cross-checks;
# sets ODEUQ_HH_IMPL / bench batch defaults for the round)
say "tpu_probe_r3"
run_step 14400 python tpu_probe_r3.py
sleep 60

# 7b. on-hardware kernel-parity pytest (compiles warm from the probe).
say "tpu kernel-parity pytest"
run_step 3000 env ODEUQ_TPU_TESTS=1 python -m pytest ../tests/test_tpu_hardware.py -q
sleep 60

# 8. fresh headline bench record (warms compile cache + updates
# .bench_cache.json last_good for the driver's run)
say "bench.py"
wait_bench
timeout 3300 python ../bench.py 2>&1 | tail -3
sleep 60

# 9. implicit-path 1k-restart north star (BASELINE.md "1k vmapped tempered
# restarts"; VERDICT r3 #5): HH 2-param reduced-4 at num_random_runs=1024
# through the bucket-compacted ladder host L-BFGS, restart chunks of 256.
say "north star: params/hodgkinhuxley2_r4 @ 1024 restarts"
wait_bench
# ODEUQ_LS_WIDTH_CAP=512: at restart_chunk=256 the default 256 cap would
# serialize the ladder's round-1 trial block into 8 full-width dispatches;
# 512 is the known-safe width for plain (loop-free) scan programs on the
# remote runtime (the >=1024 faults were vmapped-while programs).
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
sleep 120

# 10. remaining tempering-ablation families (all LV2-scale)
for fam in params_temp_low_coarse params_temp_high_coarse \
           params_temp_high_fine params_temp_num_low_coarse \
           params_temp_num_low_fine params_temp_num_high_coarse \
           params_temp_num_high_fine; do
  estimation "$fam/lotkavolterra2" "/tmp/${fam}.log"
done

# 11. second solver/model points for trajectory + calibration families
for exp in ekf_trajectory/dopri65/lorenz pf_trajectory/dopri65/lorenz \
           ekf_trajectory/rkf45/lotkavolterra pf_trajectory/rkf45/lotkavolterra; do
  say "run_filter $exp"
  run_step 1800 python run_filter.py --experiment "$exp"
  sleep 60
done
say "run_calibration calibration/dopri65/lotkavolterra"
run_step 3600 python run_calibration.py --experiment calibration/dopri65/lotkavolterra
sleep 60

# 12. parameter ladder + multi-compartment (long; whatever wall remains)
STALL_S_OVR=2700 ATTEMPT_S_OVR=10800 estimation params/hodgkinhuxley6_r1 /tmp/hh6r1.log
report params/hodgkinhuxley6_r1
STALL_S_OVR=2700 ATTEMPT_S_OVR=14400 estimation params/hodgkinhuxley9_r1 /tmp/hh9r1.log
report params/hodgkinhuxley9_r1
STALL_S_OVR=2700 ATTEMPT_S_OVR=10800 estimation params/hodgkinhuxley2_c2_r4 /tmp/hh2c2r4.log

say "queue r4c complete"
