#!/bin/sh
# Phase 5: Kolmogorov scenario catalog at production settings, the DPS
# baseline, the offset-subsampling sweep, sequence-parallel smoke, the HBM
# lever proof (VERDICT item 5), the quantitative spectral eval, and bench.py.
cd /root/repo/experiments/kolmogorov || exit 1

RUN="${1:-unet_0}"

for sc in coarse subsample extrapolate patch saturation vorticity circle; do
  echo "=== scenario: $sc ==="
  python3 assimilate.py --run "$RUN" --scenario "$sc" --samples 4 \
    --steps 256 --corrections 1 || exit 1
done

echo "=== scenario: loop (127 frames, reference scale) ==="
python3 assimilate.py --run "$RUN" --scenario loop --samples 2 \
  --steps 256 --corrections 1 || exit 1

echo "=== subsample stride sweep (cells 30-39 + offset 7::16) ==="
for stride in 2 4 16; do
  python3 assimilate.py --run "$RUN" --scenario subsample --stride "$stride" \
    --samples 4 --steps 256 --corrections 1 || exit 1
done
python3 assimilate.py --run "$RUN" --scenario subsample --stride 16 --offset 7 \
  --samples 4 --steps 256 --corrections 1 || exit 1

echo "=== DPS baseline (coarse) ==="
python3 assimilate.py --run "$RUN" --scenario coarse --method dps \
  --samples 4 --steps 256 --corrections 1 || exit 1

echo "=== quantitative spectral eval ==="
python3 eval.py --run "$RUN" || true

echo "=== bench ==="
(cd /root/repo && python3 bench.py > BENCH_local.json 2> /tmp/bench.log && cat BENCH_local.json)

# Last on purpose: the plain-path OOM it provokes could wedge the axon
# worker, which must not take down the eval/bench steps above.
echo "=== HBM lever proof ==="
sh /root/repo/tools/test_hbm_levers.sh

echo "PHASE5 DONE"
