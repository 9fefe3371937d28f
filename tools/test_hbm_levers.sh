#!/bin/sh
# HBM-lever proof (VERDICT item 5): a guided loop-closure sample whose plain
# batched window path exceeds single-chip HBM, but which completes with the
# chunked window evaluation + guidance remat (MCScoreNet(chunk) +
# GaussianScore(remat)).
#
# 16 samples x 127 frames -> 16*123 = 1968 U-Net rows per eval; one level-0
# activation alone is ~3 GB, and the guidance VJP stores many of them ->
# plain path OOMs. chunk=16 evaluates 256 rows at a time and remat
# recomputes the net inside the VJP instead of storing it.
cd /root/repo/experiments/kolmogorov || exit 1

echo "=== plain path (expected to OOM) ==="
python3 assimilate.py --run unet_0 --scenario loop --samples 16 \
  --steps 128 --corrections 1 --no-render 2>&1 | tail -5

echo "=== chunk=16 + remat (expected to complete) ==="
python3 assimilate.py --run unet_0 --scenario loop --samples 16 \
  --steps 128 --corrections 1 --chunk 16 --remat --no-render
