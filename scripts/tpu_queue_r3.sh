#!/bin/bash
# Round-3 TPU work queue. Waits for the flagship HH-full babysitter to exit,
# then runs the remaining on-TPU deliverables strictly sequentially (the
# remote runtime cannot take two clients at once; see DESIGN §10):
#   1. tRMSE for the flagship estimation (CPU f64)
#   2. round-3 perf probes (grad crash boundary, Pallas cross-checks)
#   3. trajectory + calibration families (EKF/PF Lorenz, VdP calibration)
#   4. `evaluate` NLL landscape for params/lotkavolterra2
#   5. parameter-ladder estimations: hodgkinhuxley6_r1, hodgkinhuxley2_c2_r4
#      (babysat; each followed by its tRMSE)
#   6. bench.py record
# Usage: nohup bash tpu_queue_r3.sh > /tmp/tpu_queue_r3.log 2>&1 &
set -u
cd "$(dirname "$0")"
LOG=/tmp/tpu_queue_r3.log

say() { echo "=== $(date +%T) $*"; }

# 0. wait for the flagship babysitter (and any straggler estimation client).
# The recorded pid can be the launcher-shell wrapper, and the wrapper can
# die while the babysitter lives on — so key on the babysitter's terminal
# log markers, and only fall back to the pid while neither has appeared.
# Never start while another estimation client could still hold the TPU.
if [ -f /tmp/hhfull_babysit.pid ]; then
  BPID=$(cat /tmp/hhfull_babysit.pid)
  say "waiting for flagship babysitter pid=$BPID"
  while ! grep -qE "=== (SUCCESS|GAVE UP)" /tmp/hhfull_r3.log 2>/dev/null; do
    if ! kill -0 "$BPID" 2>/dev/null \
        && ! pgrep -x -f "bash babysit_estimation.sh params/hodgkinhuxley11_full /tmp/hhfull_r3.log" >/dev/null 2>&1; then
      say "babysitter gone without terminal marker; proceeding"
      break
    fi
    sleep 60
  done
fi
say "flagship done; cooling down 240s (runtime recovery window)"
sleep 240

# 1. flagship tRMSE (CPU f64; light)
say "compute_trmse hodgkinhuxley11_full"
timeout 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
  --experiment params/hodgkinhuxley11_full --set float64=true \
  --set parameter_estimates_input=../results/params/hodgkinhuxley11_full.h5 \
  2>&1 | tail -5

# 2. perf probes (crash boundary for bench batch, Pallas TPU cross-checks).
# Generous timeout: uncached batch widths compile slowly on the remote stack,
# and the probe runs each (impl,batch) cell in its own child process.
say "tpu_probe_r3"
timeout 14400 python tpu_probe_r3.py 2>&1 | grep -v WARNING
sleep 60

# 3. trajectory + calibration families
for exp in ekf_trajectory/rkf45/lorenz pf_trajectory/rkf45/lorenz; do
  say "run_filter $exp"
  timeout 1800 python run_filter.py --experiment "$exp" 2>&1 | tail -3
  sleep 60
done
say "run_calibration calibration/rkf45/vanderpol"
timeout 3600 python run_calibration.py --experiment calibration/rkf45/vanderpol 2>&1 | tail -3
sleep 60

# 4. NLL landscape grid (the evaluate subcommand's first real artifact)
say "evaluate landscape params/lotkavolterra2"
timeout 5400 python run_parameter_estimation.py evaluate \
  --experiment params/lotkavolterra2 2>&1 | tail -3
sleep 60

# 5. parameter ladder (long; babysat with mid-stage checkpoints)
say "ladder: hodgkinhuxley6_r1"
STALL_S=2700 ATTEMPT_S=10800 bash babysit_estimation.sh \
  params/hodgkinhuxley6_r1 /tmp/hh6r1.log
say "ladder: hodgkinhuxley6_r1 tRMSE"
timeout 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
  --experiment params/hodgkinhuxley6_r1 --set float64=true \
  --set parameter_estimates_input=../results/params/hodgkinhuxley6_r1.h5 \
  2>&1 | tail -5
sleep 240

say "ladder: hodgkinhuxley2_c2_r4"
STALL_S=2700 ATTEMPT_S=10800 bash babysit_estimation.sh \
  params/hodgkinhuxley2_c2_r4 /tmp/hh2c2r4.log
say "ladder: hodgkinhuxley2_c2_r4 tRMSE"
timeout 1800 env ODEUQ_PLATFORM=cpu python compute_trmse.py \
  --experiment params/hodgkinhuxley2_c2_r4 --set float64=true \
  --set parameter_estimates_input=../results/params/hodgkinhuxley2_c2_r4.h5 \
  2>&1 | tail -5
sleep 240

# 6. headline bench
say "bench.py"
timeout 3600 python ../bench.py 2>&1 | tail -3
say "queue complete"
