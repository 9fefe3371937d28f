r"""Multi-host (multi-controller) scale-out: the 2-process demo must train
the real Trainer as one SPMD program with loss parity vs single-process.

The reference's only scale-out is Slurm job arrays (independent processes,
SURVEY.md §5); ``tools/multihost_demo.py`` is the DCN counterpart — a global
``dp`` mesh spanning processes, per-host dataset shards
(``host_sharded_array``), and cross-host gradient psum inserted by XLA.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_two_process_training_parity():
    # Timeout must exceed the launcher's own per-worker communicate()
    # timeout (480 s) so launcher-side failure diagnostics and its
    # worker-cleanup finally-block always run before pytest gives up.
    out = subprocess.run(
        [sys.executable, str(REPO / 'tools/multihost_demo.py'),
         '--launch', '2', '--devices', '2'],
        capture_output=True, text=True, timeout=570,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert 'MULTIHOST DEMO OK' in out.stdout
    # Each worker asserts dp-training parity AND cross-process sp-sampling
    # parity (halo exchange over the process boundary).
    assert out.stdout.count('] PARITY OK') == 2
    assert out.stdout.count('] SP PARITY OK') == 2
