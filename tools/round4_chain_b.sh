#!/bin/sh
# Round-4 follow-on chip chain: runs AFTER tools/next_chip_queue.sh finishes
# (one TPU, strictly serial). Covers the round-4 VERDICT items the recovery
# queue does not: the ddim-vs-dpm2m quality-vs-steps curves (#4), the
# loop-closure-at-production-budget runs enabled by dpm2m (#4), the
# guidance-knob CSV sweep for the residual-ratio question (#5), the bench
# trace leg (#1), and — time permitting — the 1024-trajectory QG dataset.
set -u
DEADLINE="${DEADLINE:-2026-08-18 15:30}"
CHAIN_H_LOG="${CHAIN_H_LOG:-/tmp/chain_h.log}"

past_deadline() {
  [ "$(date +%s)" -ge "$(date -d "$DEADLINE" +%s)" ]
}
check() {
  if past_deadline; then echo "DEADLINE: skipping rest ($*)"; exit 0; fi
  echo "=== $* $(date) ==="
}

# 0. Wait for the recovery chain to finish (it owns the chip until then).
echo "waiting for chain_h $(date)"
while :; do
  if past_deadline; then echo "DEADLINE while waiting for chain_h"; exit 0; fi
  if grep -q 'CHAIN_H DONE\|DEADLINE' "$CHAIN_H_LOG" 2>/dev/null; then
    echo "chain_h finished $(date)"
    break
  fi
  sleep 120
done
# If chain_h hit its deadline while the chip was still down, stop too.
if grep -q 'DEADLINE while chip down' "$CHAIN_H_LOG" 2>/dev/null; then
  echo 'chip never came back; nothing to do'; exit 0
fi

# 1. Solver quality-vs-steps curves (VERDICT #4).
check "kolmogorov solver sweep"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 3600 python3 sweep_solver.py --run unet_0 --samples 4 \
  --steps 32,64,128,256 || echo "kolmogorov solver sweep failed"

check "lorenz solver sweep"
cd /root/repo/experiments/lorenz || exit 1
timeout 2700 python3 sweep_solver.py --run local_k2_0 --index 0 \
  --steps 16,32,64,128,256 || echo "lorenz solver sweep failed"

# 2. Loop closure at sample counts the worker ceiling previously blocked:
# corrections=0 (dpm2m live) halves the per-step eval count, steps=128
# halves it again — samples 4 x steps 128 x C=0 is the same program wall
# as the passing samples 1 x steps 256 x C=1.
check "loop closure at samples>=2 (dpm2m)"
cd /root/repo/experiments/kolmogorov || exit 1
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 4 --steps 128 --corrections 0 --solver dpm2m --no-render --save \
  || echo "loop dpm2m s4x128 failed"
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 4 --steps 128 --corrections 0 --solver ddim --no-render \
  || echo "loop ddim control failed"
timeout 2400 python3 assimilate.py --run unet_0 --scenario loop \
  --samples 8 --steps 128 --corrections 0 --solver dpm2m --no-render \
  || echo "loop dpm2m s8x128 failed (ceiling?)"

# 3. Guidance-knob sweep -> CSV (VERDICT #5; supersedes the print-only
# tau sweep in the recovery queue with an idempotent table).
check "guidance knob sweep"
timeout 5400 python3 sweep_guidance.py --run unet_0 --samples 4 --steps 256 \
  || echo "guidance sweep failed"

# 4. Bench trace leg (VERDICT #1: attribute the non-MXU wall share).
check "bench --trace"
cd /root/repo || exit 1
timeout 2400 python3 bench.py --trace /tmp/trace_r4 \
  > /tmp/bench_r4_trace.json 2>/tmp/bench_r4_trace.log \
  || echo "bench trace failed"
grep '"metric"' /tmp/bench_r4_trace.json | tail -1

# 5. QG 1024-trajectory dataset (BASELINE.json config 5 scale) — ~2 h,
# only if the deadline allows; training/eval reruns belong to a later
# session once the bigger dataset exists.
check "QG 1024-trajectory dataset"
cd /root/repo/experiments/qg || exit 1
timeout 9000 python3 generate.py --trajectories 1024 --chunk 32 \
  || echo "qg 1024 regen failed"

echo "CHAIN_B DONE $(date)"
