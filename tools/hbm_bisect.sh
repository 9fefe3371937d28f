#!/bin/sh
# HBM-lever bisect (round-3 VERDICT item 6): memory-vs-chunk compile curve
# plus bounded execution trials of the guided 127-frame loop-closure program
# on the real runtime. Each trial is its own process: a worker crash kills
# only that trial and the chip recovers before the next one.
#
# Results accumulate as JSON lines in
# experiments/kolmogorov/storage/results/hbm_bisect.jsonl.
cd /root/repo/experiments/kolmogorov || exit 1
OUT=storage/results/hbm_bisect.jsonl
mkdir -p storage/results

probe() {
  echo "--- hbm_probe $* ---" >&2
  # hbm_probe.py exits nonzero on *handled* failures too (compile_failed /
  # exec_failed, with their own JSON records), so the crash fallback keys on
  # "no record appended", not on the exit code — otherwise every handled
  # failure would also log a phantom process_died line.
  before=$(wc -l < "$OUT" 2>/dev/null || echo 0)
  timeout 1200 python3 hbm_probe.py "$@" >> "$OUT" 2>/dev/null || true
  after=$(wc -l < "$OUT" 2>/dev/null || echo 0)
  [ "$after" -gt "$before" ] \
    || echo "{\"args\": \"$*\", \"status\": \"process_died\"}" >> "$OUT"
}

echo "=== compile-time memory curve (samples 16 x 127 frames) ===" >&2
probe --samples 16 --compile-only                       # plain: expect OOM
probe --samples 16 --chunk 64 --remat --compile-only
probe --samples 16 --chunk 32 --remat --compile-only
probe --samples 16 --chunk 16 --remat --compile-only
probe --samples 16 --chunk 8  --remat --compile-only

echo "=== execution trials (chunk 16 + remat, steps 8) ===" >&2
probe --samples 1  --chunk 16 --remat --steps 8
probe --samples 2  --chunk 16 --remat --steps 8
probe --samples 4  --chunk 16 --remat --steps 8
probe --samples 8  --chunk 16 --remat --steps 8
probe --samples 16 --chunk 16 --remat --steps 8

echo "=== HBM BISECT DONE ===" >&2
cat "$OUT"
