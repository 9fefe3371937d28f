r"""The driver's benchmark entry must stay runnable: ``bench.py --smoke``
exercises all three workloads (guided sampler with both compute-dtype legs,
train epoch incl. the bf16 variant, data generation) on tiny shapes and
prints one JSON line."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_smoke_json():
    # Env vars cannot force CPU here (sitecustomize registers the TPU
    # plugin before they are read — CLAUDE.md); use the in-code config
    # update via a runpy shim, as the verify recipe does.
    shim = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys, runpy; sys.argv = ['bench.py', '--smoke']; "
        f"runpy.run_path({str(REPO / 'bench.py')!r}, run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, '-c', shim],
        capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-3000:]

    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)

    for key in ('metric', 'value', 'unit', 'vs_baseline',
                'sampler_wall_s', 'sampler_compute_dtype',
                'sampler_residual', 'train_steps_per_s',
                'datagen_traj_per_min'):
        assert key in d, f'missing {key}'
    # Smoke primary is f32 (random init) with the bf16 variant measured.
    assert d['sampler_compute_dtype'] == 'f32'
    assert 'sampler_bf16_wall_s' in d
    assert 'bf16_speedup' in d
    # Per-dtype outputs agree (same weights, same keys).
    assert abs(d['sampler_residual'] - d['sampler_residual_bf16']) < 0.05 * (
        abs(d['sampler_residual']) + 1e-6
    )
