#!/bin/sh
# Lorenz evaluation grid: 5 models (local k=1..4 + global) x {lo, hi} x
# indices 0-15 x corrections {0,1,2,4,8,16}, 1024 samples, 256 steps.
#
# The reference grid is 64 indices (eval.py:42); we evaluate the first 16 —
# a deliberate 4x index subsample to fit the single-chip TPU budget (stated
# in README/STATUS). CSV rows are deduped, so crashed runs resume; C=16 runs
# at --block 1 (larger blocks have crashed the axon TPU worker).
set -x
cd /root/repo/experiments/lorenz || exit 1

INDICES="${1:-0-15}"

run_cell() {
  # run_cell <run> <localflag> <freq> <corrections> <block>
  for attempt in 1 2 3; do
    python3 eval.py evaluate --run "$1" $2 --freq "$3" \
      --indices "$INDICES" --corrections "$4" --block "$5" && return 0
    echo "retry $attempt: $1 $3 C=$4"
    sleep 10
  done
  echo "FAILED after retries: $1 $3 C=$4"
  return 1
}

for freq in lo hi; do
  for k in 1 2 3 4; do
    run_cell "local_k${k}_0" "--local" "$freq" "0,1,2,4,8" 4
    run_cell "local_k${k}_0" "--local" "$freq" "16" 1
  done
  run_cell "global_0" "--global" "$freq" "0,1,2,4,8" 4
  run_cell "global_0" "--global" "$freq" "16" 1
done

echo "GRID DONE"
