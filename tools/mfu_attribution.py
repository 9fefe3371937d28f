#!/usr/bin/env python
r"""Attribute the flagship sampler's non-MXU wall share (VERDICT r4 #6).

BENCH reports ~45% bf16 MFU for the fused guided sampler; this tool breaks
the other ~55% down by timing nested sub-programs of the SAME workload
(coarse scenario, trained ``unet_0``, production dtypes) and comparing each
leg's achieved TFLOP/s against the analytic FLOPs it performs:

1. ``kernel_forward`` — the raw window-kernel U-Net forward on the full
   window batch (112 windows). The conv/MXU ceiling: nothing else can be
   faster than this.
2. ``score_forward`` — MCScoreNet over the whole trajectory (unfold ->
   kernel -> fold). Gap vs (1) = windowing overhead.
3. ``guided_eval`` — one GaussianScore evaluation (forward + guidance VJP,
   2.0x forward FLOPs). Gap vs 2x(2) = VJP inefficiency + guidance math.
4. ``sampler_step`` — the fused sampler amortized per eval (16 steps x 1
   correction). Gap vs (3) = predictor/corrector elementwise + scan body
   overhead.

Each leg reports wall per eval, analytic TFLOP/s, and MFU vs the chip's
bf16 peak. Output: one JSON line (also written to
``tools/out/mfu_attribution.json``).

The jax.profiler trace (``bench.py --trace``) never produced an artifact on
the axon runtime (round-3 finding); this ablation needs only wall clocks.
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'experiments/kolmogorov'))

from utils import load_score, make_trajectory_eps  # noqa: E402

from sda_tpu.diffusion import GaussianScore, VPSDE  # noqa: E402
from sda_tpu.dynamics import coarsen  # noqa: E402
from sda_tpu.nn.flops import guided_sampler_flops, score_unet_flops  # noqa: E402
from sda_tpu.utils import enable_compilation_cache  # noqa: E402


def _drain(out):
    r"""Force execution of every dispatched program and fetch one scalar.

    On the axon runtime ``jax.block_until_ready`` can return before the
    program has actually executed on the worker (round-5 finding: sub-ms
    "walls" for 448-window U-Net batches). Fetching a scalar reduction to
    the host is the only reliable barrier: programs execute in dispatch
    order on the single chip, so the fetch drains the whole queue.
    """

    return float(np.asarray(jnp.sum(out)))


def timeit(fn, *args, reps: int = 8, retries: int = 3):
    r"""Steady-state wall of a jitted fn (compile + warmup excluded).

    Retries on transient tunnel errors (remote_compile body closed etc. —
    the round-5 rc=1 failure mode), and measures throughput by dispatching
    ``reps`` calls then draining, which is robust to async dispatch.
    """

    last = None
    for attempt in range(retries):
        try:
            out = fn(*args)
            _drain(out)  # compile + warmup + queue drain
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            _drain(out)
            return (time.perf_counter() - t0) / reps, out
        except Exception as e:  # noqa: BLE001 — tunnel errors are ad hoc
            last = e
            print(f'timeit retry {attempt + 1}: {e}', file=sys.stderr,
                  flush=True)
            time.sleep(10)
    raise last


def chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    if 'v5 lite' in kind or 'v5e' in kind:
        return 197e12
    return 197e12


def main():
    enable_compilation_cache()

    length, batch, window = 32, 4, 5
    steps_probe, corrections = 16, 1

    runpath = REPO / 'experiments/kolmogorov/storage/runs/unet_0'
    module, params, config = load_score(runpath)
    arch = {
        k: config[k]
        for k in ('embedding', 'hidden_channels', 'hidden_blocks', 'kernel_size')
        if k in config
    }

    A = lambda x: coarsen(x[..., ::4, :, :, :], 8)
    y = jax.random.normal(jax.random.key(1), (length // 4, 2, 8, 8)) * 0.1

    n_windows = length - 2 * (window // 2)
    per_window = score_unet_flops(
        channels=window * 2, context_channels=1, size=64, **arch
    )
    peak = chip_peak_flops()

    legs = {}

    def record(name, wall, flops, extra=None):
        legs[name] = {
            'wall_ms': round(1e3 * wall, 3),
            'tflops': round(flops / wall / 1e12, 1),
            'mfu_pct': round(100 * flops / wall / peak, 1),
            **(extra or {}),
        }
        print(f'{name}: {legs[name]}', file=sys.stderr, flush=True)

    # 1. Raw kernel forward on the full window batch.
    xw = jax.random.normal(
        jax.random.key(2), (n_windows * batch, window * 2, 64, 64), jnp.float32
    )
    tv = jnp.full((n_windows * batch,), 0.5, jnp.float32)

    kf = jax.jit(lambda x, t: module.apply({'params': params}, x, t))
    wall, _ = timeit(kf, xw, tv)
    record('kernel_forward', wall, per_window * n_windows * batch)

    # 2. Windowed score over the whole trajectory.
    score = make_trajectory_eps(module, params, window)
    xt = jax.random.normal(
        jax.random.key(3), (batch, length, 2, 64, 64), jnp.float32
    )
    sf = jax.jit(lambda x, t: score(x, t))
    wall, _ = timeit(sf, xt, jnp.float32(0.5))
    record('score_forward', wall, per_window * n_windows * batch)

    # 3. One guided evaluation (forward + VJP).
    guided = GaussianScore(
        y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
    )
    gf = jax.jit(lambda x, t: guided(x, t))
    wall, _ = timeit(gf, xt, jnp.float32(0.5))
    record('guided_eval', wall, 2.0 * per_window * n_windows * batch)

    # 4. Fused sampler amortized per eval (short probe run).
    sde = VPSDE(eps=guided, shape=(length, 2, 64, 64))
    sp = jax.jit(lambda key: sde.sample(
        key, (batch,), steps=steps_probe, corrections=corrections, tau=0.5
    ))
    wall, _ = timeit(sp, jax.random.key(4), reps=2)
    n_evals = steps_probe * (1 + corrections)
    flops = guided_sampler_flops(
        per_window, n_windows=n_windows, batch=batch,
        steps=steps_probe, corrections=corrections,
    )
    record('sampler_per_eval', wall / n_evals, flops / n_evals,
           {'probe_steps': steps_probe})

    # Attribution: where each layer of wrapping loses throughput.
    k, s, g, f = (legs[n]['tflops'] for n in
                  ('kernel_forward', 'score_forward', 'guided_eval',
                   'sampler_per_eval'))
    out = {
        'legs': legs,
        'peak_tflops': peak / 1e12,
        'conv_ceiling_mfu_pct': legs['kernel_forward']['mfu_pct'],
        'windowing_efficiency': round(s / k, 3),
        'vjp_efficiency': round(g / s, 3),
        'sampler_body_efficiency': round(f / g, 3),
        'dtype': 'bf16' if config.get('bf16') else 'f32',
    }
    print(json.dumps(out))

    outdir = REPO / 'tools/out'
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / 'mfu_attribution.json').write_text(json.dumps(out, indent=2) + '\n')


if __name__ == '__main__':
    main()
