#!/bin/sh
# Serial TPU training queue: Lorenz k-sweep (k=1..4, windows 3/5/7/9) x 3
# seeds + global x 3 seeds. Matches the reference's array=3 per variant
# (reference experiments/lorenz/train.py:47,97). Idempotent: skips runs whose
# final state.msgpack exists.
cd /root/repo/experiments/lorenz || exit 1

for k in 1 2 3 4; do
  w=$((2 * k + 1))
  for s in 0 1 2; do
    if [ ! -f "storage/runs/local_k${k}_${s}/state.msgpack" ]; then
      echo "=== local k=$k (window $w) seed $s ==="
      python3 train.py --model local --window "$w" --seed "$s" || exit 1
    fi
  done
done

for s in 0 1 2; do
  if [ ! -f "storage/runs/global_${s}/state.msgpack" ]; then
    echo "=== global seed $s ==="
    python3 train.py --model global --seed "$s" || exit 1
  fi
done

echo "QUEUE DONE"
