#!/bin/sh
# Phase 3: Kolmogorov dataset (reference scale: 1024 x 128 steps @ 256^2,
# coarsened 4x -> (N,64,2,64,64)), solver validation gate, U-Net training
# (3 seeds, matching the reference's array=3). Idempotent.
cd /root/repo/experiments/kolmogorov || exit 1

# Prelude — Lorenz seed-spread cells (VERDICT item 8): one grid cell
# (lo, C=8, indices 0-7) for the seed-1/2 siblings of every model family,
# so the README table can quote mean +/- spread across training seeds.
# Rows land in the same deduped stats_lo.csv; idempotent like the grid.
(
  cd /root/repo/experiments/lorenz || exit 1
  for run in local_k1_1 local_k1_2 local_k2_1 local_k2_2 \
             local_k3_1 local_k3_2 local_k4_1 local_k4_2; do
    python3 eval.py evaluate --run "$run" --local --freq lo \
      --indices 0-7 --corrections 8 --block 2 || echo "seed-spread fail: $run"
  done
  for run in global_1 global_2; do
    python3 eval.py evaluate --run "$run" --global --freq lo \
      --indices 0-7 --corrections 8 --block 2 || echo "seed-spread fail: $run"
  done
  python3 figures.py || true
)

if [ ! -f storage/data/train.h5 ]; then
  echo "=== generate (1024 traj @ 256^2) ==="
  python3 generate.py || exit 1
fi

if [ ! -f storage/results/solver_validation.json ]; then
  echo "=== solver validation gate ==="
  python3 validate_solver.py || exit 1
fi

# Seeds to train are the arguments (default: seed 0 now; seeds 1 2 run as a
# later phase if the TPU budget allows — stated in README).
SEEDS="${*:-0}"
for s in $SEEDS; do
  if [ ! -f "storage/runs/unet_${s}/state.msgpack" ]; then
    echo "=== unet seed $s ==="
    python3 train.py --seed "$s" --bf16 --resume || exit 1
  fi
done

echo "PHASE3 DONE"
