#!/bin/sh
# Round-2 pipeline, final leg (~3.5 h TPU left at switch). The 1024-traj QG
# generation measured ~2 h on this chip; 256 trajectories (~30 min) keeps
# the QG end-to-end demonstration inside the round — stated in README.
set -u

cd /root/repo/experiments/qg || exit 1

if [ ! -f storage/data/train.h5 ]; then
  echo "=== QG generate (256 traj) $(date) ==="
  python3 generate.py --trajectories 256 || exit 1
fi
if [ ! -f storage/runs/qg_0/state.msgpack ]; then
  echo "=== QG train seed 0 (1536 epochs) $(date) ==="
  python3 train.py --seed 0 --epochs 1536 --resume || exit 1
fi
for sc in upper coarse subsample; do
  echo "=== QG assimilate: $sc $(date) ==="
  python3 assimilate.py --run qg_0 --scenario "$sc" --samples 4 \
    --steps 256 --corrections 1 || echo "QG $sc failed"
done
echo "=== QG DONE $(date) ==="

cd /root/repo/experiments/lorenz || exit 1

run_cell() {
  for attempt in 1 2 3; do
    python3 eval.py evaluate --run "$1" $2 --freq "$3" \
      --indices "$6" --corrections "$4" --block "$5" && return 0
    echo "retry $attempt: $1 $3 C=$4"
    sleep 10
  done
  echo "FAILED after retries: $1 $3 C=$4"
  return 1
}

echo "=== hi half, remaining models (C in {0,1,8}) $(date) ==="
run_cell local_k2_0 --local hi "8" 2 0-7
for k in 3 4; do
  run_cell "local_k${k}_0" --local hi "0,1" 8 0-7
  run_cell "local_k${k}_0" --local hi "8" 2 0-7
done
run_cell global_0 --global hi "0,1" 8 0-7
run_cell global_0 --global hi "8" 2 0-7
echo "=== HI DONE $(date) ==="

echo "=== HBM lever proof $(date) ==="
sh /root/repo/tools/test_hbm_levers.sh

echo "=== figures + multimodal $(date) ==="
python3 figures.py || true
python3 multimodal.py --run global_0 || true

echo "=== seed-spread cells (lo, C=8) $(date) ==="
for run in local_k2_1 local_k2_2; do
  run_cell "$run" --local lo 8 2 0-7
done
for run in global_1 global_2; do
  run_cell "$run" --global lo 8 2 0-7
done
python3 figures.py || true
echo "=== SPREAD DONE $(date) ==="

cd /root/repo/experiments/kolmogorov || exit 1
echo "=== quantitative spectral eval $(date) ==="
python3 eval.py --run unet_0 || true

echo "=== scenario catalog (until the round ends) $(date) ==="
for sc in coarse extrapolate loop saturation subsample patch vorticity circle; do
  echo "=== scenario: $sc $(date) ==="
  python3 assimilate.py --run unet_0 --scenario "$sc" --samples 4 \
    --steps 256 --corrections 1 || echo "scenario $sc failed"
done
python3 assimilate.py --run unet_0 --scenario subsample --stride 16 --offset 7 \
  --samples 4 --steps 256 --corrections 1 || true
python3 assimilate.py --run unet_0 --scenario coarse --method dps \
  --samples 4 --steps 256 --corrections 1 || true

echo "=== bench (local record) $(date) ==="
(cd /root/repo && python3 bench.py > BENCH_local.json 2>> /tmp/bench.log && cat BENCH_local.json)

echo "CHAIN_D DONE $(date)"
