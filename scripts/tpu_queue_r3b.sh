#!/bin/bash
# Round-3 follow-up TPU queue: breadth for the families that still have no
# recorded artifact (params_plus/, params_baseline/, tempering ablations,
# cov-update-enabled estimation problems). Launch AFTER tpu_queue_r3.sh
# exits; runs strictly sequentially for the single-client remote runtime.
# Usage: nohup bash tpu_queue_r3b.sh > /tmp/tpu_queue_r3b.log 2>&1 &
set -u
cd "$(dirname "$0")"

say() { echo "=== $(date +%T) $*"; }

trmse() {
  timeout 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
    --experiment "$1" --set float64=true \
    --set parameter_estimates_input="../results/$1.h5" 2>&1 | tail -4
}

# Wait for queue r3: its recorded pid can be the launcher-shell wrapper, so
# also stop waiting once the queue's own completion marker appears.
if [ -f /tmp/tpu_queue_r3.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3.pid)" 2>/dev/null; then
  say "waiting for tpu_queue_r3 pid=$(cat /tmp/tpu_queue_r3.pid)"
  while kill -0 "$(cat /tmp/tpu_queue_r3.pid)" 2>/dev/null \
      && ! grep -q "queue complete" /tmp/tpu_queue_r3.log 2>/dev/null; do
    sleep 120
  done
fi
say "queue r3 done; cooling down 240s"
sleep 240

# 1. params_plus: masked gamma-noise weights variant of the LV2 problem
say "params_plus/lotkavolterra2"
STALL_S=2700 ATTEMPT_S=10800 bash babysit_estimation.sh \
  params_plus/lotkavolterra2 /tmp/lv2_plus.log
trmse params_plus/lotkavolterra2
sleep 240

# 2. params_baseline: reference baseline protocol output of the same problem
#    (filter-free trajectory fitting -> its own entrypoint script)
say "params_baseline/lotkavolterra2"
STALL_S=2700 ATTEMPT_S=10800 SCRIPT=run_parameter_estimation_baseline.py \
  bash babysit_estimation.sh \
  params_baseline/lotkavolterra2 /tmp/lv2_baseline.log
trmse params_baseline/lotkavolterra2
sleep 240

# 3. cov-update-enabled estimation (disable_cov_update=False path under
#    optimization -- the one estimation mode with no recorded artifact)
say "params/pendulum"
STALL_S=2700 ATTEMPT_S=10800 bash babysit_estimation.sh \
  params/pendulum /tmp/pendulum.log
trmse params/pendulum
sleep 240

# 4. tempering-schedule ablation representative
say "params_temp_low_fine/lotkavolterra2"
STALL_S=2700 ATTEMPT_S=10800 bash babysit_estimation.sh \
  params_temp_low_fine/lotkavolterra2 /tmp/lv2_temp.log
sleep 240

# 5. one more ladder point (9 params, bridges 6 -> 11)
say "params/hodgkinhuxley9_r1"
STALL_S=2700 ATTEMPT_S=14400 bash babysit_estimation.sh \
  params/hodgkinhuxley9_r1 /tmp/hh9r1.log
trmse params/hodgkinhuxley9_r1

say "queue r3b complete"

# 6. human-readable recovery tables for every recorded estimation (CPU-only;
# appended so the tables exist even with no interactive session alive)
for exp in params/hodgkinhuxley11_full params/hodgkinhuxley6_r1 \
           params/hodgkinhuxley2_c2_r4 params/hodgkinhuxley9_r1 \
           params/pendulum params/hodgkinhuxley2_r4 params/lotkavolterra2 \
           params_plus/lotkavolterra2 params_baseline/lotkavolterra2 \
           params_temp_low_fine/lotkavolterra2; do
  if [ -f "../results/$exp.h5" ]; then
    say "report $exp"
    timeout 600 env ODEUQ_PLATFORM=cpu python report_estimation.py \
      --experiment "$exp" --set parameter_estimates_input="../results/$exp.h5" \
      2>&1 | grep -v -i warning
  fi
done
say "reports done"
