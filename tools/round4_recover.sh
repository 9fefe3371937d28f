#!/bin/sh
# Round-4 storage recovery queue. The round-4 VM came up with
# experiments/*/storage/ empty (gitignored artifacts do not survive a VM
# reset): every dataset, trained model, and result CSV from rounds 1-3 is
# gone. This queue regenerates the evidence base in strict value order on
# the single chip, sized to fit one session:
#
#   1. datasets (Lorenz, Kolmogorov 1024x256^2)
#   2. Lorenz zoo seed 0 (k2 / global / k4) -- minutes each
#   3. Kolmogorov flagship unet_0 (bf16), bounded wall, resumable,
#      periodic state.msgpack snapshots so a timeout still yields a model
#   4. quality gates: coarse assimilation + eval.py + bench refresh with
#      the trained weights
#   5. Lorenz eval mini-grid (lo, C in {0,2,8,16}, 16 indices) + figures
#   6. QG (dataset + short train + gate) only if time remains
#
# Everything is idempotent (artifact-exists / CSV-key / --resume skips);
# re-launching after a crash is safe. DEADLINE stops new work.
set -u
DEADLINE="${DEADLINE:-2026-08-18 19:45}"
KTRAIN_STOP="${KTRAIN_STOP:-2026-08-18 18:30}"  # when to pause unet_0 training

past() { [ "$(date +%s)" -ge "$(date -d "$1" +%s)" ]; }
tleft() {  # seconds until $1, floored at 60
  s=$(( $(date -d "$1" +%s) - $(date +%s) )); [ "$s" -lt 60 ] && s=60; echo "$s"
}
check() {
  if past "$DEADLINE"; then echo "DEADLINE: skipping rest ($*)"; exit 0; fi
  echo "=== $* $(date) ==="
}

# 0. Wait for any bench already holding the chip.
while ps -p "$(cat /tmp/bench.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  echo "waiting for running bench $(date)"; sleep 60
  past "$DEADLINE" && exit 0
done

# 1. Lorenz dataset (fast).
check "lorenz generate"
cd /root/repo/experiments/lorenz || exit 1
[ -f storage/data/train.h5 ] || timeout 1800 python3 generate.py \
  || echo "lorenz generate failed"

# 2. Kolmogorov dataset (the long-pole dependency of the flagship).
check "kolmogorov generate"
cd /root/repo/experiments/kolmogorov || exit 1
[ -f storage/data/train.h5 ] || timeout 3600 python3 generate.py \
  || echo "kolmogorov generate failed"

# 3. Lorenz zoo, seed 0 (k2 = legacy window default 5, global, k4).
cd /root/repo/experiments/lorenz || exit 1
check "lorenz train local k2 seed 0"
[ -f storage/runs/local_k2_0/state.msgpack ] || timeout 2400 python3 train.py \
  --model local --window 5 --seed 0 --resume || echo "k2_0 train failed"
check "lorenz train global seed 0"
[ -f storage/runs/global_0/state.msgpack ] || timeout 2400 python3 train.py \
  --model global --seed 0 --resume || echo "global_0 train failed"
check "lorenz train local k4 seed 0"
[ -f storage/runs/local_k4_0/state.msgpack ] || timeout 2400 python3 train.py \
  --model local --window 9 --seed 0 --resume || echo "k4_0 train failed"

# 4. Kolmogorov flagship unet_0, bf16, bounded by KTRAIN_STOP. The train
# loop snapshots state.msgpack every 64 epochs, so the timeout kill still
# leaves a usable model; --resume makes a relaunch continue.
check "kolmogorov train unet_0 (bounded)"
cd /root/repo/experiments/kolmogorov || exit 1
if ! past "$KTRAIN_STOP"; then
  timeout "$(tleft "$KTRAIN_STOP")" python3 train.py --seed 0 --bf16 --resume \
    || echo "unet_0 train stopped (timeout/bound) rc=$?"
fi
[ -f storage/runs/unet_0/state.msgpack ] || {
  echo "NO unet_0 weights at all -- skipping kolmogorov gates"; }

# 5. Quality gates with whatever unet_0 exists.
if [ -f storage/runs/unet_0/state.msgpack ]; then
  check "kolmogorov coarse assimilation"
  timeout 2400 python3 assimilate.py --run unet_0 --scenario coarse \
    --samples 4 --steps 256 --corrections 1 --no-render --save \
    || echo "coarse assimilation failed"
  check "kolmogorov eval gate"
  timeout 2400 python3 eval.py --run unet_0 || echo "eval unet_0 failed"
  check "bench refresh with trained weights"
  cd /root/repo || exit 1
  timeout 3600 python3 bench.py > /tmp/bench_r4b.json 2>/tmp/bench_r4b.log \
    || echo "bench refresh failed"
  line=$(grep '"metric"' /tmp/bench_r4b.json | tail -1)
  [ -n "$line" ] && printf '%s\n' "$line" > /root/repo/BENCH_local.json
fi

# 6. Lorenz eval mini-grid: lo frequency, 16 indices, C in {0,2,8,16}.
check "lorenz eval mini-grid"
cd /root/repo/experiments/lorenz || exit 1
[ -f storage/results/obs.h5 ] || timeout 900 python3 eval.py observations \
  || echo "observations failed"
cell() {  # RUN FLAG C BLOCK INDICES FREQ
  past "$DEADLINE" && return 1
  timeout 2700 python3 eval.py evaluate --run "$1" $2 --freq "$6" \
    --indices "$5" --corrections "$3" --block "$4" \
    || echo "cell failed: $*"
}
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  [ -f "storage/runs/$1/state.msgpack" ] || continue
  cell "$1" "$2" 0 16 0-15 lo
  cell "$1" "$2" 2 6 0-15 lo
  cell "$1" "$2" 8 2 0-15 lo
  cell "$1" "$2" 16 1 0-7 lo
done

# 7. Lorenz figures + ground-truth statistics table refresh.
check "lorenz figures"
timeout 1200 python3 figures.py || echo "figures failed"

# 8. Kolmogorov method sweep (SDA vs DPS, quantitative catalog) if time.
check "kolmogorov method sweep"
cd /root/repo/experiments/kolmogorov || exit 1
if [ -f storage/runs/unet_0/state.msgpack ]; then
  timeout "$(tleft "$DEADLINE")" python3 sweep_methods.py --run unet_0 \
    || echo "method sweep failed"
fi

# 9. QG: dataset + short train + gate, only with remaining time.
check "qg generate"
cd /root/repo/experiments/qg || exit 1
[ -f storage/data/train.h5 ] || timeout 3600 python3 generate.py \
  --trajectories 256 --chunk 32 || echo "qg generate failed"
check "qg train seed 0 (bounded)"
timeout "$(tleft "$DEADLINE")" python3 train.py --seed 0 --epochs 1536 \
  --resume || echo "qg train stopped rc=$?"
check "qg eval gate"
[ -f storage/runs/qg_0/state.msgpack ] && \
  timeout 2700 python3 eval.py --run qg_0 --indices 0-7 \
  || echo "qg eval skipped/failed"

echo "ROUND4_RECOVER DONE $(date)"
