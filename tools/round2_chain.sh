#!/bin/sh
# Serial TPU pipeline chain for round 2: waits for the running phase-2 grid
# (PID in /tmp/grid.pid) to finish, then runs phases 3-5 back to back so the
# chip never idles. Each phase script is idempotent (guarded by artifacts).
set -u

GRID_PID="$(cat /tmp/grid.pid 2>/dev/null || echo '')"
if [ -n "$GRID_PID" ]; then
  echo "chain: waiting for phase 2 (pid $GRID_PID)"
  while kill -0 "$GRID_PID" 2>/dev/null; do sleep 30; done
fi
echo "chain: phase 2 done at $(date)"

echo "chain: phase 3 (kolmogorov gen + validate + train seed 0)"
sh /root/repo/tools/round2_phase3.sh 0 >> /tmp/phase3.log 2>&1
echo "chain: phase 3 exit=$? at $(date)"

echo "chain: phase 4 (QG end-to-end)"
sh /root/repo/tools/round2_phase4.sh >> /tmp/phase4.log 2>&1
echo "chain: phase 4 exit=$? at $(date)"

echo "chain: phase 5 (scenario catalog + HBM levers + bench)"
sh /root/repo/tools/round2_phase5.sh unet_0 >> /tmp/phase5.log 2>&1
echo "chain: phase 5 exit=$? at $(date)"

echo "chain: phase 3b (kolmogorov seeds 1 2)"
sh /root/repo/tools/round2_phase3.sh 1 2 >> /tmp/phase3b.log 2>&1
echo "chain: phase 3b exit=$? at $(date)"

echo "CHAIN DONE at $(date)"
