#!/usr/bin/env python
r"""Same-host head-to-head: the UNMODIFIED reference guided sampler (torch,
``/root/reference/sda/score.py``) vs our fused JAX sampler, identical
scenario, identical hardware (this host's CPU, torch at its default thread
count — which on this 1-core host is 1 thread).

Primary purpose: measure the reference's per-eval cost at the production
architecture so ``bench.py`` can combine it with the TPU wall clock into
the end-to-end ``vs_baseline`` ratio.

Caveat on the secondary ``framework_speedup_same_host`` number (measured
0.25, i.e. our sampler is ~4x SLOWER than torch on this CPU): on CPU the
comparison measures conv-library quality, not framework structure —
torch's oneDNN/MKL conv kernels are far better tuned for x86 than
XLA:CPU's codegen, and that gap swamps the fused-scan-vs-eager-loop
effect this script was meant to isolate. The structural effect is visible
on the TPU instead (``fusion_speedup`` in bench.py, same chip, same XLA
kernels either way), and the absolute TPU efficiency is pinned by the
analytic-FLOP MFU. The CPU number is kept because it is a measurement;
it is labeled for what it is.

Measurement scenario (scaled down so single-core torch finishes in minutes;
both frameworks batch the window axis, so per-eval cost scales linearly in
``windows x batch`` on both sides): 8-frame trajectory at 64^2, window-5
(96,192,384)x(3,3,3) U-Net — the production architecture — batch 1, 8x
coarsening every 4th frame, 2 predictor steps, 0 corrections.

Tool-only harness (like the zuko shim): the forcing-channel wrapper and the
mean-pool coarsen are re-stated here in torch because the reference's
kolmogorov utils import jax-cfd, which is not installed.
"""

import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))  # zuko shim
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo')

import os  # noqa: E402

import numpy as np  # noqa: E402
import torch  # noqa: E402

# Torch keeps its DEFAULT thread count — no artificial pinning. This host
# exposes a single CPU core (os.cpu_count() == 1 at measurement time), so
# "default" and "single thread" coincide here; the JSON records both the
# core count and the thread count so the baseline configuration is part of
# the artifact rather than a footnote (ADVICE r3 medium).

from sda.score import (  # noqa: E402
    GaussianScore as RefGaussianScore,
    MCScoreNet as RefMCScoreNet,
    ScoreUNet as RefScoreUNet,
    VPSDE as RefVPSDE,
)

LENGTH, WINDOW, BATCH, STEPS, CORRECTIONS = 8, 5, 1, 2, 0
ARCH = dict(
    embedding=64,
    hidden_channels=(96, 192, 384),
    hidden_blocks=(3, 3, 3),
    kernel_size=3,
    activation=torch.nn.SiLU,
    spatial=2,
    padding_mode='circular',
)


def torch_coarsen(x, r):
    # Reference KolmogorovFlow.coarsen semantics (sda/mcs.py:340-347).
    h, w = x.shape[-2:]
    x = x.reshape(*x.shape[:-2], h // r, r, w // r, r)
    return x.mean(dim=(-3, -1))


class RefLocalScoreUNet(RefScoreUNet):
    # Forcing-channel kernel (reference experiments/kolmogorov/utils.py:29-46).
    def __init__(self, channels, size=64, **kwargs):
        super().__init__(channels, 1, **kwargs)
        domain = 2 * torch.pi / size * (torch.arange(size) + 1 / 2)
        forcing = torch.sin(4 * domain).expand(1, size, size).clone()
        self.register_buffer('forcing', forcing)

    def forward(self, x, t, c=None):
        return super().forward(x, t, self.forcing)


def bench_reference():
    torch.manual_seed(0)
    # (features, context, order) signature, sda/score.py:122; the throwaway
    # default kernel is immediately replaced by the forcing-channel U-Net.
    score = RefMCScoreNet(features=2, order=WINDOW // 2)
    score.kernel = RefLocalScoreUNet(channels=WINDOW * 2, **ARCH)

    A = lambda x: torch_coarsen(x[..., ::4, :, :, :], 8)
    y = 0.1 * torch.randn(LENGTH // 4, 2, 8, 8)

    sde = RefVPSDE(
        RefGaussianScore(y, A=A, std=0.1, sde=RefVPSDE(score, shape=()), gamma=1e-2),
        shape=(LENGTH, 2, 64, 64),
    )

    # Warm one full sampler call (allocator, thread pools), then time one.
    sde.sample((BATCH,), steps=STEPS, corrections=CORRECTIONS, tau=0.5)
    t0 = time.perf_counter()
    x = sde.sample((BATCH,), steps=STEPS, corrections=CORRECTIONS, tau=0.5)
    wall = time.perf_counter() - t0
    assert torch.isfinite(x).all()

    return wall


def bench_ours():
    import jax

    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from sda_tpu.diffusion import GaussianScore, LocalScoreUNet, VPSDE, bind_eps
    from sda_tpu.diffusion.windowed import MCScoreNet
    from sda_tpu.dynamics import coarsen

    module = LocalScoreUNet(
        channels=WINDOW * 2,
        size=64,
        embedding=64,
        hidden_channels=(96, 192, 384),
        hidden_blocks=(3, 3, 3),
        kernel_size=3,
        activation=jax.nn.silu,
    )
    params = module.init(
        jax.random.key(0), np.zeros((1, WINDOW * 2, 64, 64), np.float32), np.ones(())
    )['params']
    score = MCScoreNet(bind_eps(module, params), order=WINDOW // 2)

    A = lambda x: coarsen(x[..., ::4, :, :, :], 8)
    y = 0.1 * jax.random.normal(jax.random.key(1), (LENGTH // 4, 2, 8, 8))

    def sample(key, y):
        sde = VPSDE(
            eps=GaussianScore(
                y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
            ),
            shape=(LENGTH, 2, 64, 64),
        )
        return sde.sample(
            key, (BATCH,), steps=STEPS, corrections=CORRECTIONS, tau=0.5
        )

    fn = jax.jit(sample)
    x = jax.block_until_ready(fn(jax.random.key(2), y))  # compile + warmup
    assert np.isfinite(np.asarray(x)).all()

    t0 = time.perf_counter()
    jax.block_until_ready(fn(jax.random.key(3), y))
    wall = time.perf_counter() - t0

    return wall


def main():
    n_evals = STEPS * (1 + CORRECTIONS)
    n_windows = LENGTH - 2 * (WINDOW // 2)

    print('benchmarking reference torch sampler (single thread) ...', flush=True)
    ref_wall = bench_reference()
    print(f'  reference: {ref_wall:.2f} s for {n_evals} evals', flush=True)

    print('benchmarking our fused sampler on the same CPU ...', flush=True)
    ours_wall = bench_ours()
    print(f'  ours     : {ours_wall:.2f} s for {n_evals} evals', flush=True)

    out = {
        'scenario': {
            'length': LENGTH,
            'window': WINDOW,
            'batch': BATCH,
            'steps': STEPS,
            'corrections': CORRECTIONS,
            'n_windows': n_windows,
            'arch': '(96,192,384)x(3,3,3) @ 64^2',
        },
        'baseline_hw': (
            f'this host CPU ({os.cpu_count()} core(s)), torch default '
            f'{torch.get_num_threads()} thread(s)'
        ),
        'host_cpus': os.cpu_count(),
        'torch_threads': torch.get_num_threads(),
        'ref_wall_s': round(ref_wall, 3),
        'ref_per_eval_s': round(ref_wall / n_evals, 4),
        'ref_per_eval_per_window_batch_s': round(
            ref_wall / n_evals / (n_windows * BATCH), 5
        ),
        'ours_cpu_wall_s': round(ours_wall, 3),
        'ours_cpu_per_eval_s': round(ours_wall / n_evals, 4),
        'framework_speedup_same_host': round(ref_wall / ours_wall, 2),
    }

    path = HERE / 'out/bench_ref_cpu.json'
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    print(f'-> {path}')


if __name__ == '__main__':
    main()
