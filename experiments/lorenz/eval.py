#!/usr/bin/env python
r"""Lorenz evaluation — BPF ground truth vs. guided SDA posterior sampling.

TPU-native counterpart of reference ``experiments/lorenz/eval.py``: frozen
observation files (lo: every-8th frame of the first coordinate + N(0, 0.05);
hi: every frame + N(0, 0.25)), then per-trajectory evaluation of BPF ground
truth and guided sampling across correction counts, with log-prior /
log-likelihood / W1 statistics appended to CSV. The reference fans this out
as a 64-job Slurm array; here it is a loop of on-device programs (use
``--index`` to evaluate a single trajectory).
"""

import argparse
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from utils import (
    PATH,
    load_score,
    log_likelihood,
    log_prior,
    make_chain,
    make_trajectory_eps,
    posterior,
)

from sda_tpu.diffusion import GaussianScore, VPSDE
from sda_tpu.eval import emd
from sda_tpu.train import append_csv, load_h5


def make_observations(seed: int = 0):
    r"""Frozen observation file (reference eval.py:16-27)."""

    x = load_h5(PATH / 'data/test.h5')[:, :65]
    rng = np.random.RandomState(seed)

    y_lo = rng.normal(x[:, ::8, :1], 0.05)
    y_hi = rng.normal(x[:, :, :1], 0.25)

    (PATH / 'results').mkdir(parents=True, exist_ok=True)

    with h5py.File(PATH / 'results/obs.h5', mode='w') as f:
        f.create_dataset('lo', data=y_lo)
        f.create_dataset('hi', data=y_hi)

    print(f'obs: lo {y_lo.shape}, hi {y_hi.shape}')


def evaluate(
    run: str,
    local: bool,
    freq: str,
    index: int,
    samples: int = 1024,
    steps: int = 256,
    corrections=(0, 1, 2, 4, 8, 16),
):
    chain = make_chain()
    key = jax.random.key(index)

    with h5py.File(PATH / 'results/obs.h5', mode='r') as f:
        y = jnp.asarray(f[freq][index], dtype=jnp.float32)

    A_raw = lambda x: chain.preprocess(x)[..., :1]

    if freq == 'lo':  # low frequency & low noise
        sigma, step = 0.05, 8
    else:  # high frequency & high noise
        sigma, step = 0.25, 1

    csv = PATH / f'results/stats_{freq}.csv'

    # Ground truth: two independent BPF runs (the second gives the
    # within-method W1 reference).
    k1, k2, k_sde = jax.random.split(key, 3)
    x = posterior(k1, y, A=A_raw, sigma=sigma, step=step)[:samples]
    x_ = posterior(k2, y, A=A_raw, sigma=sigma, step=step)[:samples]

    log_px = float(jnp.mean(log_prior(x)))
    log_py = float(jnp.mean(log_likelihood(y, x, A=A_raw, sigma=sigma, step=step)))
    w1 = emd(x, x_)

    append_csv(csv, f'{index},ground-truth,,{log_px},{log_py},{w1}')
    print('GT:', log_px, log_py, w1, flush=True)

    # Guided SDA sampling
    runpath = PATH / f'runs/{run}'
    module, params, config = load_score(runpath, local=local)
    score = make_trajectory_eps(module, params, local, config.get('window', 5))

    for C in corrections:
        sde = VPSDE(
            eps=GaussianScore(
                y=y,
                A=lambda x: x[..., ::step, :1],
                std=sigma,
                sde=VPSDE(eps=score, shape=()),
                gamma=3e-2,
            ),
            shape=(65, 3),
        )

        k_sde, sub = jax.random.split(k_sde)
        xs = sde.sample(sub, (samples,), steps=steps, corrections=C, tau=0.25)
        xs = chain.postprocess(xs)

        log_px = float(jnp.mean(log_prior(xs)))
        log_py = float(jnp.mean(log_likelihood(y, xs, A=A_raw, sigma=sigma, step=step)))
        w1 = emd(xs, x_)

        append_csv(csv, f'{index},{run},{C},{log_px},{log_py},{w1}')
        print(f'{C:02d}:', log_px, log_py, w1, flush=True)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('command', choices=['observations', 'evaluate'])
    parser.add_argument('--run', type=str, default='local_0')
    parser.add_argument('--local', action='store_true', default=True)
    parser.add_argument('--global', dest='local', action='store_false')
    parser.add_argument('--freq', choices=['lo', 'hi'], default='lo')
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--samples', type=int, default=1024)
    parser.add_argument('--steps', type=int, default=256)
    args = parser.parse_args()

    if args.command == 'observations':
        make_observations()
    else:
        evaluate(args.run, args.local, args.freq, args.index, args.samples, args.steps)
