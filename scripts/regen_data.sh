#!/bin/bash
# Regenerate the deterministic data artifacts (gt/ trajectories and
# noise_gt/ observation files) that every estimation / filter / calibration
# experiment consumes. All runs are seeded, so regeneration is bit-exact
# for a given backend: losing results/ (e.g. a VM reset — it happened
# between rounds 3 and 4) costs only these solver runs, not the data.
#
# Usage: bash regen_data.sh            # everything missing
#        FORCE=1 bash regen_data.sh    # everything, overwriting
set -u
cd "$(dirname "$0")"
FORCE=${FORCE:-0}

regen() {
  local exp="$1" out="../results/$1.h5"
  if [ "$FORCE" = 1 ] || [ ! -f "$out" ]; then
    echo "=== $(date +%T) run_ode_solver $exp"
    case "$exp" in
      gt/*)
        # Ground truth is f64 on CPU, matching the reference's x64 runs
        # (reference scripts/run_ode_solver.py:10). The calibration family
        # scores these trajectories at static noise levels down to 1e-16,
        # where f32 solve drift (~1e-3 rel over 1e6 steps) would dominate.
        timeout 3600 env ODEUQ_PLATFORM=cpu python run_ode_solver.py \
          --experiment "$exp" --set float64=true 2>&1 | tail -2 ;;
      *)
        # noise_gt stays on the default backend/dtype: the committed
        # estimation artifacts were optimized against exactly these bytes
        # (they are git-tracked; regen here is a last-resort fallback).
        timeout 3600 python run_ode_solver.py --experiment "$exp" 2>&1 | tail -2 ;;
    esac
  else
    echo "=== $exp exists, skipping"
  fi
}

for exp in \
  gt/lotkavolterra gt/lorenz gt/vanderpol gt/lcao gt/rlc \
  gt/hodgkinhuxley_full gt/hodgkinhuxley_r1 gt/hodgkinhuxley_r4 \
  noise_gt/lotkavolterra noise_gt/lorenz noise_gt/vanderpol noise_gt/lcao \
  noise_gt/pendulum noise_gt/hodgkinhuxley_full noise_gt/hodgkinhuxley_r1 \
  noise_gt/hodgkinhuxley_r4 noise_gt/hodgkinhuxley_c2_r1 \
  noise_gt/hodgkinhuxley_c2_r4; do
  regen "$exp"
done
echo "=== regen complete"
