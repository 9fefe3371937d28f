#!/bin/sh
# Phase 2: Lorenz observations + full eval grid (5 models x {lo,hi} x
# indices x corrections {0,1,2,4,8,16}).
cd /root/repo/experiments/lorenz || exit 1

if [ ! -f storage/results/obs.h5 ]; then
  python3 eval.py observations || exit 1
fi

sh /root/repo/tools/run_lorenz_grid.sh "${1:-0-15}"

echo "=== statistics figure + table (figures.ipynb cell 9) ==="
python3 figures.py || true

echo "=== multimodal-posterior demo (figures.ipynb cells 10-15) ==="
python3 multimodal.py --run global_0 || true

echo "PHASE2 DONE"
