#!/bin/sh
# Round-5 Lorenz evaluation grid, priority-ordered (VERDICT r4 #2):
# regenerate stats_lo.csv / stats_hi.csv from the COMMITTED seed-0 weights
# (local_k2_0, local_k4_0, global_0) at the reference's 64-index scale
# (reference experiments/lorenz/eval.py:42), C in {0,1,2,4,8,16}.
#
# Priority order (each cell is deduped + resumable, so an interrupted run
# loses nothing): lo for all three models at C<=8, then lo C=16, then hi.
# Axon wall-clock ceiling: (1 + C) x block <= ~18 (see run_lorenz_grid.sh).
set -x
cd /root/repo/experiments/lorenz || exit 1

INDICES="${1:-0-63}"

run_cell() {
  # run_cell <run> <localflag> <freq> <corrections> <block> <indices>
  for attempt in 1 2 3; do
    python3 -u eval.py evaluate --run "$1" $2 --freq "$3" \
      --indices "$6" --corrections "$4" --block "$5" && return 0
    echo "retry $attempt: $1 $3 C=$4"
    sleep 10
  done
  echo "FAILED after retries: $1 $3 C=$4"
  return 1
}

# Phase 1: lo, C <= 8, all three committed models.
for model in "local_k2_0 --local" "local_k4_0 --local" "global_0 --global"; do
  set -- $model
  run="$1"; flag="$2"
  run_cell "$run" "$flag" lo "0,1" 8 "$INDICES"
  run_cell "$run" "$flag" lo "2" 6 "$INDICES"
  run_cell "$run" "$flag" lo "4" 3 "$INDICES"
  run_cell "$run" "$flag" lo "8" 2 "$INDICES"
done

# Phase 2: lo, C = 16 (block 1 — the expensive convergence-claim cells).
for model in "local_k4_0 --local" "global_0 --global" "local_k2_0 --local"; do
  set -- $model
  run_cell "$1" "$2" lo "16" 1 "$INDICES"
done

# Phase 3: hi, C <= 8 (dense observations converge by C=8; C=16 adds nothing
# on hi — round-3 finding, stated in run_lorenz_grid.sh).
for model in "local_k2_0 --local" "local_k4_0 --local" "global_0 --global"; do
  set -- $model
  run="$1"; flag="$2"
  run_cell "$run" "$flag" hi "0,1" 8 "$INDICES"
  run_cell "$run" "$flag" hi "2" 6 "$INDICES"
  run_cell "$run" "$flag" hi "4" 3 "$INDICES"
  run_cell "$run" "$flag" hi "8" 2 "$INDICES"
done

echo "GRID R5 DONE"
