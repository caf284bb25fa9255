#!/bin/bash
# Round-4 follow-up queue: covers every experiment family the main r4 queue
# leaves without an executed artifact — the seven remaining tempering
# ablations (all LV2-scale, reference configs params_temp_*/lotkavolterra2)
# plus a second solver point for the trajectory and calibration families.
# Launch AFTER tpu_queue_r4.sh prints its terminal marker:
#   nohup bash tpu_queue_r4b.sh > /tmp/tpu_queue_r4b.log 2>&1 &
# Same discipline as r4: strictly sequential, bench-lock aware.
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

# 0. wait for the main r4 queue's terminal marker (if it is running).
if [ -f /tmp/queue_r4.pid ] && kill -0 "$(cat /tmp/queue_r4.pid)" 2>/dev/null; then
  say "waiting for tpu_queue_r4 terminal marker"
  while ! grep -q "queue r4 complete" /tmp/tpu_queue_r4.log 2>/dev/null; do
    if ! kill -0 "$(cat /tmp/queue_r4.pid)" 2>/dev/null; then
      say "r4 queue gone without marker; proceeding"
      break
    fi
    sleep 60
  done
  sleep 120
fi

# 1. tempering-ablation families (VERDICT r3 missing #3: zero-artifact).
# params_temp_low_fine/lotkavolterra2 is handled by the main queue.
for fam in params_temp_low_coarse params_temp_high_coarse \
           params_temp_high_fine params_temp_num_low_coarse \
           params_temp_num_low_fine params_temp_num_high_coarse \
           params_temp_num_high_fine; do
  say "$fam/lotkavolterra2"
  wait_bench
  STALL_S=1800 ATTEMPT_S=7200 bash babysit_estimation.sh \
    "$fam/lotkavolterra2" "/tmp/${fam}.log"
  sleep 120
done

# 2. second solver point for the trajectory families (Dopri65 column).
for exp in ekf_trajectory/dopri65/lorenz pf_trajectory/dopri65/lorenz \
           ekf_trajectory/rkf45/lotkavolterra pf_trajectory/rkf45/lotkavolterra; do
  say "run_filter $exp"
  wait_bench
  timeout 1800 python run_filter.py --experiment "$exp" 2>&1 | tail -3
  sleep 60
done

# 3. second calibration point (Dopri65 column of the Conrad comparison).
say "run_calibration calibration/dopri65/lotkavolterra"
wait_bench
timeout 3600 python run_calibration.py \
  --experiment calibration/dopri65/lotkavolterra 2>&1 | tail -3
sleep 60

say "queue r4b complete"
