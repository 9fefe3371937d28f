#!/bin/sh
# Lorenz evaluation grid: 5 models (local k=1..4 + global) x {lo, hi} x
# indices x corrections {0,1,2,4,8,16}, 1024 samples, 256 steps.
#
# The reference grid is 64 indices (eval.py:42); we evaluate the first 16 —
# a deliberate 4x index subsample to fit the single-chip TPU budget (stated
# in README/STATUS). CSV rows are deduped, so crashed runs resume.
#
# The axon TPU worker kills long-running single programs: the guided-sampler
# program's wall clock scales with (1 + corrections) x block, and
# (1+8) x block4 crashed it (round-2 log) as did C=16 at block>=2 (round 1).
# Keep (1 + C) x block <= ~20: C<=4 at block 4, C=8 at block 2, C=16 at
# block 1.
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
    run_cell "local_k${k}_0" "--local" "$freq" "0,1,2,4" 4
    run_cell "local_k${k}_0" "--local" "$freq" "8" 2
    run_cell "local_k${k}_0" "--local" "$freq" "16" 1
  done
  run_cell "global_0" "--global" "$freq" "0,1,2,4" 4
  run_cell "global_0" "--global" "$freq" "8" 2
  run_cell "global_0" "--global" "$freq" "16" 1
done

echo "GRID DONE"
