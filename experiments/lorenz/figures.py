#!/usr/bin/env python
r"""Lorenz demo figure: BPF posterior vs. zero-shot SDA vs. weak 4D-Var.

Counterpart of the reference's ``experiments/lorenz/figures.ipynb``: for one
test observation sequence, overlays the observed coordinate's ground-truth
posterior envelope (bootstrap particle filter), the guided SDA posterior
samples, and the 4D-Var point estimate. Writes
``storage/results/assimilation.png``.
"""

import argparse

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from utils import (
    PATH,
    load_score,
    make_chain,
    make_trajectory_eps,
    posterior,
    weak_4d_var,
)

from sda_tpu.diffusion import GaussianScore, VPSDE


def main(run: str, local: bool, freq: str, index: int, samples: int, steps: int):
    chain = make_chain()
    key = jax.random.key(index)

    with h5py.File(PATH / 'results/obs.h5', mode='r') as f:
        y = jnp.asarray(f[freq][index], dtype=jnp.float32)

    A_raw = lambda x: chain.preprocess(x)[..., :1]
    sigma, step = (0.05, 8) if freq == 'lo' else (0.25, 1)

    k1, k2, k3 = jax.random.split(key, 3)

    # Ground truth: BPF posterior envelope.
    x_bpf = posterior(k1, y, A=A_raw, sigma=sigma, step=step, particles=4096)
    x_bpf = x_bpf[:samples]

    # Zero-shot SDA posterior.
    module, params, config = load_score(PATH / f'runs/{run}', local=local)
    score = make_trajectory_eps(module, params, local, config.get('window', 5))

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
    x_sda = sde.sample(k2, (samples,), steps=steps, corrections=2, tau=0.25)
    x_sda = chain.postprocess(x_sda)

    # Weak 4D-Var point estimate, started from a prior rollout.
    x0 = chain.prior(k3, ())
    x0 = chain.trajectory(jax.random.key(0), x0, length=64, last=True)
    start = chain.trajectory(jax.random.key(1), x0, length=65)
    x_var = weak_4d_var(
        start, y, A=A_raw, sigma=sigma, step=step, iterations=200,
    )

    # Figure
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    t = np.arange(65) * 0.025
    t_obs = t[::step]
    y_phys = np.asarray(y) * 8.0  # un-standardize coordinate 0 (mu=0, sigma=8)

    fig, ax = plt.subplots(figsize=(10, 4))

    bpf0 = np.asarray(x_bpf[..., 0])
    lo, hi = np.percentile(bpf0, [5, 95], axis=0)
    ax.fill_between(t[: bpf0.shape[1]], lo, hi, alpha=0.25, label='BPF 90% envelope')

    sda0 = np.asarray(x_sda[..., 0])
    for i in range(min(16, samples)):
        ax.plot(t, sda0[i], lw=0.5, alpha=0.4, color='C1')
    ax.plot([], [], color='C1', label='SDA posterior samples')

    ax.plot(t, np.asarray(x_var[..., 0]), 'k--', lw=1.5, label='weak 4D-Var')
    ax.plot(t_obs, y_phys[:, 0], 'r.', ms=8, label='observations')

    ax.set(xlabel='time', ylabel='$x_1$', title=f'Lorenz assimilation ({freq})')
    ax.legend(loc='upper right', fontsize=8)
    fig.tight_layout()

    out = PATH / 'results/assimilation.png'
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=130)
    print(f'wrote {out}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='local_0')
    parser.add_argument('--local', action='store_true', default=True)
    parser.add_argument('--global', dest='local', action='store_false')
    parser.add_argument('--freq', choices=['lo', 'hi'], default='lo')
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--samples', type=int, default=64)
    parser.add_argument('--steps', type=int, default=256)
    args = parser.parse_args()

    main(args.run, args.local, args.freq, args.index, args.samples, args.steps)
