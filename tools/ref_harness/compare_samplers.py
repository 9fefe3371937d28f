#!/usr/bin/env python
r"""Diagnostic: reference torch sampler vs our fused sampler at IDENTICAL
settings (same ref-trained weights, same observation, same steps/corrections)
— the final leg of the fidelity bisection. Different RNG streams, so the
comparison is distributional: log-prior / log-likelihood / W1-vs-BPF.

Run sample_ref.py first; this script samples ours on CPU and prints both
metric rows.
"""

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments/lorenz')

import jax

jax.config.update('jax_platforms', 'cpu')

import h5py  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from utils import (  # noqa: E402
    load_score, log_likelihood, log_prior, make_chain, make_trajectory_eps,
)

from sda_tpu.diffusion import GaussianScore, VPSDE  # noqa: E402
from sda_tpu.eval import emd  # noqa: E402

STORAGE = Path('/root/repo/experiments/lorenz/storage')


def metrics(tag, x, y, x_bpf, chain, sigma, step):
    A_raw = lambda x: chain.preprocess(x)[..., :1]
    x = jnp.asarray(x)
    lp = float(jnp.mean(log_prior(x)))
    ll = float(jnp.mean(log_likelihood(y, x, A=A_raw, sigma=sigma, step=step)))
    w1 = emd(np.asarray(x), x_bpf[: x.shape[0]])
    print(f'{tag:>14}: log_prior={lp:9.2f}  log_py={ll:7.3f}  W1={w1:6.3f}')


def main(index=0, samples=128, steps=64, corrections=4):
    chain = make_chain()
    sigma, step = 0.05, 8

    with h5py.File(STORAGE / 'results/obs.h5') as f:
        y = jnp.asarray(f['lo'][index], dtype=jnp.float32)

    with np.load(STORAGE / f'results/bpf_lo/idx{index}.npz') as z:
        x_bpf = z['x_']

    # Reference sampler output (torch, produced by sample_ref.py).
    ref = np.load(HERE / f'out/ref_samples_i{index}_s{steps}_c{corrections}.npy')

    # Our fused sampler, same weights/settings.
    module, params, config = load_score(
        STORAGE / 'runs/ref_local_0', local=True
    )
    score = make_trajectory_eps(module, params, local=True, window=config['window'])
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
    ours = chain.postprocess(
        sde.sample(jax.random.key(7), (samples,), steps=steps, corrections=corrections, tau=0.25)
    )

    # BPF self-floor at this sample count.
    with np.load(STORAGE / f'results/bpf_lo/idx{index}.npz') as z:
        x1 = z['x'][:samples]
    print(f'BPF self-W1 at n={samples}: {emd(x1, x_bpf[:samples]):.3f}')

    metrics('reference', ref, y, x_bpf, chain, sigma, step)
    metrics('ours', ours, y, x_bpf, chain, sigma, step)


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
