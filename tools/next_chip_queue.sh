#!/bin/sh
# Chip queue carried over from round 3: the axon tunnel died at ~19:10 on
# 2026-08-17 (4 h outage, infrastructure fault) before these idempotent
# steps could run. Round 4: set DEADLINE, run this first — it idles until
# the chip answers, then works through the queue in value order. Every
# step skips work whose CSV rows / artifacts already exist.
set -u
DEADLINE="${DEADLINE:-2026-08-18 23:00}"

past_deadline() {
  [ "$(date +%s)" -ge "$(date -d "$DEADLINE" +%s)" ]
}
check() {
  if past_deadline; then echo "DEADLINE: skipping rest ($*)"; exit 0; fi
  echo "=== $* $(date) ==="
}

# 0. Wait for the chip to come back.
echo "waiting for TPU $(date)"
while :; do
  if past_deadline; then echo "DEADLINE while chip down"; exit 0; fi
  if timeout 90 python3 -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" 2>/dev/null; then
    echo "TPU BACK $(date)"
    break
  fi
  sleep 120
done

cell() {  # cell RUN FLAG C BLOCK INDICES FREQ
  if past_deadline; then echo "DEADLINE: skip cell $*"; return 1; fi
  for attempt in 1 2 3; do
    timeout 2700 python3 eval.py evaluate --run "$1" $2 --freq "$6" \
      --indices "$5" --corrections "$3" --block "$4" && return 0
    echo "retry $attempt: $1 $6 C=$3"; sleep 20
  done
  echo "FAILED: $1 $6 C=$3"; return 1
}

# 1. Finish the lo C=16 gaps (k4 rows 51-63 lost to the crash; global
# rows 0-3/8-15 never ran — round-2's 0-7 cell only covered 4-7).
cd /root/repo/experiments/lorenz || exit 1
check "lo C=16 gap cells"
cell "local_k4_0" "--local" 16 1 48-63 lo
cell "global_0" "--global" 16 1 0-15 lo

# 2. Validate the new bench legs on the chip (f32 variant + residuals).
check "bench (bf16/f32 variants)"
cd /root/repo || exit 1
timeout 2400 python3 bench.py > /tmp/bench_r3b.json 2>/tmp/bench_r3b.log \
  || echo "bench failed"
tail -1 /tmp/bench_r3b.json
# Refresh the committed artifact only when a real JSON line exists — a
# plain redirect would truncate BENCH_local.json on a failed bench run.
line=$(grep '"metric"' /tmp/bench_r3b.json | tail -1)
if [ -n "$line" ]; then
  printf '%s\n' "$line" > /root/repo/BENCH_local.json
else
  echo 'BENCH_local refresh skipped (no bench output)'
fi

# 3. Lorenz seed cells at the C=16 headline (VERDICT 3 seed spread).
cd /root/repo/experiments/lorenz || exit 1
check "lorenz seed cells C=16"
for m in "local_k2_1 --local" "local_k2_2 --local" "global_1 --global" \
         "global_2 --global" "local_k4_1 --local" "local_k4_2 --local"; do
  set -- $m
  cell "$1" "$2" 16 1 0-7 lo
done

# 4. QG: train seed 1 on the existing dataset + quantitative gates.
check "QG train seed 1"
cd /root/repo/experiments/qg || exit 1
[ -f storage/runs/qg_1/state.msgpack ] || \
  timeout 5400 python3 train.py --seed 1 --epochs 1536 --resume \
  || echo "qg train 1 failed"
check "QG eval gates"
timeout 2700 python3 eval.py --run qg_0 --indices 0-7 || echo "qg eval 0 failed"
timeout 2700 python3 eval.py --run qg_1 --indices 0-7 || echo "qg eval 1 failed"

# 5. Production bf16-vs-f32 residual parity + tau sweep (round-2 Weak 8).
check "coarse --f32 precision control"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 1200 python3 assimilate.py --run unet_0 --scenario coarse \
  --samples 4 --steps 256 --corrections 1 --no-render --f32 \
  || echo "f32 control failed"
check "kolmogorov corrections/tau sweep"
for C in 2 4; do
  for TAU in 0.25 0.5; do
    timeout 1200 python3 assimilate.py --run unet_0 --scenario coarse \
      --samples 4 --steps 256 --corrections "$C" --tau "$TAU" --no-render \
      || echo "tau sweep C=$C tau=$TAU failed"
  done
done

# 6. Lorenz hi grid, value order: C={0,1,8} then the rest.
cd /root/repo/experiments/lorenz || exit 1
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  check "lorenz hi 64-index C=0,1,8: $1"
  cell "$1" "$2" 0 16 8-63 hi
  cell "$1" "$2" 1 8 8-63 hi
  cell "$1" "$2" 8 2 8-63 hi
done
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  check "lorenz hi C=2,4,16: $1"
  cell "$1" "$2" 2 6 8-63 hi
  cell "$1" "$2" 4 3 8-63 hi
  cell "$1" "$2" 16 1 0-15 hi
  cell "$1" "$2" 16 1 16-31 hi
  cell "$1" "$2" 16 1 32-47 hi
  cell "$1" "$2" 16 1 48-63 hi
done

check "final figure refresh"
cd /root/repo/experiments/lorenz && python3 figures.py || true
cd /root/repo/experiments/kolmogorov && python3 figures.py || true
echo "CHAIN_H DONE $(date)"
