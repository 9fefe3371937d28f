#!/bin/sh
# Phase 4: QG end-to-end — dataset (128^2 sim coarsened to 64^2), window-
# kernel training, and the three assimilation scenarios (VERDICT item 3).
cd /root/repo/experiments/qg || exit 1

if [ ! -f storage/data/train.h5 ]; then
  echo "=== QG generate ==="
  python3 generate.py || exit 1
fi

if [ ! -f storage/runs/qg_0/state.msgpack ]; then
  echo "=== QG train seed 0 ==="
  python3 train.py --seed 0 --resume || exit 1
fi

for sc in upper coarse subsample; do
  echo "=== QG assimilate: $sc ==="
  python3 assimilate.py --run qg_0 --scenario "$sc" --samples 4 \
    --steps 256 --corrections 1 || exit 1
done

echo "PHASE4 DONE"
