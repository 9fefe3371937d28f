#!/bin/sh
# Round-4 master chip queue. Merges the outage-stranded recovery chain
# (tools/next_chip_queue.sh) and the round-4 follow-on (round4_chain_b.sh)
# into ONE serial queue ordered by VERDICT r3 value: a clean driver-witnessed
# bench first (#1/#7), then the lo-grid gap cells (#2), the solver
# quality-vs-steps curves (#4), QG seed 1 + gates (#3), the guidance-knob
# sweep (#5), loop closure at production budget (#4b), the 'hi' eval grid
# (#2, largest, ordered cheap-C first), the Lorenz seed cells, the f32
# control, the bench trace leg, and finally the 128^2-native stretch (#8).
# Every step is idempotent (CSV-key / artifact-exists skips); the queue
# idles until the TPU answers and respects DEADLINE throughout.
set -u
DEADLINE="${DEADLINE:-2026-08-18 17:00}"

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

# 1. VERDICT #1/#7: the clean bench, FIRST thing in the chip session.
check "bench (per-dtype legs, analytic MFU)"
cd /root/repo || exit 1
timeout 3000 python3 bench.py > /tmp/bench_r4.json 2>/tmp/bench_r4.log \
  || echo "bench failed"
tail -1 /tmp/bench_r4.json
line=$(grep '"metric"' /tmp/bench_r4.json | tail -1)
if [ -n "$line" ]; then
  printf '%s\n' "$line" > /root/repo/BENCH_local.json
else
  echo 'BENCH_local refresh skipped (no bench output)'
fi

# 2. VERDICT #2a: the lo C=16 gap cells (k4 rows 48-63 lost to the round-3
# crash; global rows 0-15 never ran).
cd /root/repo/experiments/lorenz || exit 1
check "lo C=16 gap cells"
cell "local_k4_0" "--local" 16 1 48-63 lo
cell "global_0" "--global" 16 1 0-15 lo

# 3. VERDICT #4: solver quality-vs-steps curves (idempotent CSVs).
check "kolmogorov solver sweep"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 3600 python3 sweep_solver.py --run unet_0 --samples 4 \
  --steps 32,64,128,256 || echo "kolmogorov solver sweep failed"
check "lorenz solver sweep"
cd /root/repo/experiments/lorenz || exit 1
timeout 2700 python3 sweep_solver.py --run local_k2_0 --index 0 \
  --steps 16,32,64,128,256 || echo "lorenz solver sweep failed"

# 4. VERDICT #3: QG seed 1 + both-seed quantitative gates.
check "QG train seed 1"
cd /root/repo/experiments/qg || exit 1
[ -f storage/runs/qg_1/state.msgpack ] || \
  timeout 7200 python3 train.py --seed 1 --epochs 1536 --resume \
  || echo "qg train 1 failed"
check "QG eval gates"
timeout 2700 python3 eval.py --run qg_0 --indices 0-7 || echo "qg eval 0 failed"
timeout 2700 python3 eval.py --run qg_1 --indices 0-7 || echo "qg eval 1 failed"

# 5. VERDICT #5: guidance-knob sweep (residual-ratio question) -> CSV.
check "guidance knob sweep"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 5400 python3 sweep_guidance.py --run unet_0 --samples 4 --steps 256 \
  || echo "guidance sweep failed"

# 5b. Refresh the per-seed eval rows with the new Wasserstein-gate columns
# (w1_gen, w1_floor, w1_ratio — the Sinkhorn production path).
check "kolmogorov eval w1 refresh"
for s in 0 1 2; do
  timeout 1800 python3 eval.py --run "unet_$s" || echo "eval unet_$s failed"
done

# 6. VERDICT #4b: loop closure at sample counts the worker ceiling blocked —
# corrections=0 (dpm2m live) + steps=128 is the same program wall as the
# passing samples 1 x steps 256 x C=1.
check "loop closure at samples>=2 (dpm2m)"
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 4 --steps 128 --corrections 0 --solver dpm2m --no-render --save \
  || echo "loop dpm2m s4x128 failed"
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 4 --steps 128 --corrections 0 --solver ddim --no-render \
  || echo "loop ddim control failed"
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 8 --steps 128 --corrections 0 --solver dpm2m --no-render \
  || echo "loop dpm2m s8x128 failed (ceiling?)"

# 7. VERDICT #2b: the 'hi' 64-index grid, cheap corrections first so partial
# completion still yields full (model x C) rows at the low-C cells.
cd /root/repo/experiments/lorenz || exit 1
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  check "lorenz hi C=0,1,2: $1"
  cell "$1" "$2" 0 16 8-63 hi
  cell "$1" "$2" 1 8 8-63 hi
  cell "$1" "$2" 2 6 8-63 hi
done
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  check "lorenz hi C=4,8: $1"
  cell "$1" "$2" 4 3 8-63 hi
  cell "$1" "$2" 8 2 8-63 hi
done

# 8. Lorenz seed cells at the C=16 headline (lo), then hi C=16.
check "lorenz seed cells C=16 lo"
for m in "local_k2_1 --local" "local_k2_2 --local" "global_1 --global" \
         "global_2 --global" "local_k4_1 --local" "local_k4_2 --local"; do
  set -- $m
  cell "$1" "$2" 16 1 0-7 lo
done
for m in "local_k2_0 --local" "global_0 --global" "local_k4_0 --local"; do
  set -- $m
  check "lorenz hi C=16: $1"
  cell "$1" "$2" 16 1 0-15 hi
  cell "$1" "$2" 16 1 16-31 hi
  cell "$1" "$2" 16 1 32-47 hi
  cell "$1" "$2" 16 1 48-63 hi
done

# 9. Production f32 precision control on coarse (round-2 Weak 8 residue).
check "coarse --f32 precision control"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 1800 python3 assimilate.py --run unet_0 --scenario coarse \
  --samples 4 --steps 256 --corrections 1 --no-render --f32 \
  || echo "f32 control failed"

# 10. Bench trace leg (VERDICT #1: attribute the non-MXU wall share).
check "bench --trace"
cd /root/repo || exit 1
timeout 2400 python3 bench.py --trace /tmp/trace_r4 \
  > /tmp/bench_r4_trace.json 2>/tmp/bench_r4_trace.log \
  || echo "bench trace failed"
grep '"metric"' /tmp/bench_r4_trace.json | tail -1

# 11. VERDICT #8 stretch: the 128^2-native score model (the reference only
# ever models 64^2). 256 trajectories at 256^2 coarsened 2x -> data128,
# a reduced-epoch window kernel, one residual-gated scenario.
check "128^2 dataset"
cd /root/repo/experiments/kolmogorov || exit 1
[ -f storage/data128/train.h5 ] || \
  timeout 3600 python3 generate.py --trajectories 256 --coarse 2 \
  --data data128 --chunk 8 || echo "data128 gen failed"
check "128^2 training"
timeout 14400 python3 train.py --seed 0 --size 128 --epochs 1024 --bf16 \
  --resume || echo "unet128_0 train failed"
check "128^2 assimilation gate"
[ -f storage/runs/unet128_0/state.msgpack ] && \
  timeout 2400 python3 assimilate.py --run unet128_0 --scenario coarse \
  --data data128 --samples 2 --steps 256 --corrections 1 --chunk 16 --remat \
  --no-render || echo "128^2 assimilation failed"

# 12. QG 1024-trajectory dataset (only if the deadline still allows).
check "QG 1024-trajectory dataset"
cd /root/repo/experiments/qg || exit 1
timeout 9000 python3 generate.py --trajectories 1024 --chunk 32 \
  || echo "qg 1024 regen failed"

check "final figure refresh"
cd /root/repo/experiments/lorenz && timeout 1200 python3 figures.py || true
cd /root/repo/experiments/kolmogorov && timeout 1200 python3 figures.py || true
echo "ROUND4_QUEUE DONE $(date)"
