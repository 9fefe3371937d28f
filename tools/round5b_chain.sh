#!/bin/sh
# Round-5 second chip session, priority-ordered. Every step is idempotent
# (CSV dedup / --only split regen), so a killed run resumes losslessly.
#
# 1. Regenerate the Kolmogorov test split (the VM reset again; weights are
#    committed but the gitignored dataset is gone). --only test fast-forwards
#    the PRNG so the split is byte-identical to the full seed-0 run.
# 2. Restore the lost round-3 method_sweep.csv (SDA vs DPS over the
#    7-scenario catalog — the quantitative figures_bis.ipynb counterpart).
# 3. Complete the Lorenz lo grid: C=16 cells for local k1/k3 (the only
#    (model, C) cells still absent from the regenerated stats_lo.csv).
# 4. Lorenz hi C=16 for the k2/k4/global trio (round-3 finding says hi
#    converges by C=8; these cells make that statement measured, not argued).
set -x

retry() {
  for attempt in 1 2 3; do
    "$@" && return 0
    echo "retry $attempt: $*"
    sleep 15
  done
  echo "FAILED after retries: $*"
  return 1
}

cd /root/repo/experiments/kolmogorov || exit 1
retry python3 -u generate.py --only test
retry python3 -u sweep_methods.py --run unet_0
touch /tmp/r5b_milestone_sweep

cd /root/repo/experiments/lorenz || exit 1
for run in local_k1_0 local_k3_0; do
  retry python3 -u eval.py evaluate --run "$run" --local --freq lo \
    --indices "${1:-0-31}" --corrections 16 --block 1
done
touch /tmp/r5b_milestone_lo16

retry python3 -u eval.py evaluate --run local_k2_0 --local --freq hi \
  --indices "${1:-0-31}" --corrections 16 --block 1
retry python3 -u eval.py evaluate --run local_k4_0 --local --freq hi \
  --indices "${1:-0-31}" --corrections 16 --block 1
retry python3 -u eval.py evaluate --run global_0 --global --freq hi \
  --indices "${1:-0-31}" --corrections 16 --block 1

echo "R5B CHAIN DONE"
