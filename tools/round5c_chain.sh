#!/bin/sh
# Round-5 third chip session: the two README "(r3)" placeholder cells —
# the Lorenz lo C=16 legs for the retrained local k=1 / k=3 models
# (stats_lo.csv rows; every index appends immediately and rows are deduped,
# so a killed run resumes losslessly). k=3 first: its C=16 value carries the
# "within 1.6x of the BPF floor" claim; k=1 only documents underfitting.
#
# Axon wall-clock ceiling: C=16 must run at block 1 ((1+C) x block <= ~18).
# If time remains, the hi C=16 trio turns the round-3 "hi converges by C=8"
# argument into a measurement.
set -x
cd /root/repo/experiments/lorenz || exit 1

INDICES="${1:-0-31}"

retry() {
  for attempt in 1 2 3; do
    "$@" && return 0
    echo "retry $attempt: $*"
    sleep 15
  done
  echo "FAILED after retries: $*"
  return 1
}

for run in local_k3_0 local_k1_0; do
  retry python3 -u eval.py evaluate --run "$run" --local --freq lo \
    --indices "$INDICES" --corrections 16 --block 1
  touch "/tmp/r5c_milestone_${run}_lo16"
done

for run in "local_k4_0 --local" "global_0 --global" "local_k2_0 --local"; do
  set -- $run
  retry python3 -u eval.py evaluate --run "$1" $2 --freq hi \
    --indices "$INDICES" --corrections 16 --block 1
  touch "/tmp/r5c_milestone_$1_hi16"
done

echo "ROUND5C CHAIN DONE"
