#!/usr/bin/env python
r"""Lorenz evaluation — BPF ground truth vs. guided SDA posterior sampling.

TPU-native counterpart of reference ``experiments/lorenz/eval.py``: frozen
observation files (lo: every-8th frame of the first coordinate + N(0, 0.05);
hi: every frame + N(0, 0.25)), then per-trajectory evaluation of BPF ground
truth and guided sampling across correction counts, with log-prior /
log-likelihood / W1 statistics appended to CSV.

The reference fans the 64-trajectory array out as Slurm jobs (eval.py:40-42);
here the whole index set is **one batched on-device program** per correction
count — BPF pairs are vmapped over observations and cached to disk, and the
guided sampler runs vmapped over observation vectors. Rows already present
in the CSV are skipped (the @ensure idempotence analog).
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


def freq_params(freq: str):
    if freq == 'lo':  # low frequency & low noise
        return 0.05, 8
    else:  # high frequency & high noise
        return 0.25, 1


def ensure_bpf(freq: str, indices, samples: int = 1024, block: int = 16):
    r"""Computes (and caches) the two independent BPF posterior sample sets
    per index (reference eval.py:58-59). Returns {index: (x, x_)} as numpy."""

    chain = make_chain()
    sigma, step = freq_params(freq)
    A_raw = lambda x: chain.preprocess(x)[..., :1]

    cache = PATH / f'results/bpf_{freq}'
    cache.mkdir(parents=True, exist_ok=True)

    with h5py.File(PATH / 'results/obs.h5', mode='r') as f:
        y_all = jnp.asarray(f[freq][:], dtype=jnp.float32)

    missing = [i for i in indices if not (cache / f'idx{i}.npz').exists()]

    def pair(key, y):
        k1, k2 = jax.random.split(key)
        x = posterior(k1, y, A=A_raw, sigma=sigma, step=step)[:samples]
        x_ = posterior(k2, y, A=A_raw, sigma=sigma, step=step)[:samples]
        return x, x_

    pair_block = jax.jit(jax.vmap(pair))

    for lo in range(0, len(missing), block):
        blk = missing[lo:lo + block]
        keys = jnp.stack([jax.random.key(i) for i in blk])
        x, x_ = pair_block(keys, y_all[jnp.asarray(blk)])
        for j, i in enumerate(blk):
            np.savez(cache / f'idx{i}.npz', x=np.asarray(x[j]), x_=np.asarray(x_[j]))
        print(f'bpf[{freq}]: cached {blk}', flush=True)

    out = {}
    for i in indices:
        with np.load(cache / f'idx{i}.npz') as z:
            out[i] = (z['x'][:samples], z['x_'][:samples])
    return out


def existing_rows(csv: Path):
    if not csv.exists():
        return set()
    rows = set()
    for line in csv.read_text().splitlines():
        parts = line.split(',')
        if len(parts) >= 3:
            rows.add((parts[0], parts[1], parts[2]))
    return rows


def evaluate(
    run: str,
    local: bool,
    freq: str,
    indices,
    samples: int = 1024,
    steps: int = 256,
    corrections=(0, 1, 2, 4, 8, 16),
    block: int = 16,
):
    chain = make_chain()
    sigma, step = freq_params(freq)
    A_raw = lambda x: chain.preprocess(x)[..., :1]

    csv = PATH / f'results/stats_{freq}.csv'
    done = existing_rows(csv)

    with h5py.File(PATH / 'results/obs.h5', mode='r') as f:
        y_all = jnp.asarray(f[freq][:], dtype=jnp.float32)

    # Ground truth: two independent BPF runs per index (cached).
    bpf_pairs = ensure_bpf(freq, indices, samples=samples, block=block)

    for i in indices:
        if (str(i), 'ground-truth', '') in done:
            continue
        x, x_ = bpf_pairs[i]
        log_px = float(jnp.mean(log_prior(jnp.asarray(x))))
        log_py = float(jnp.mean(log_likelihood(y_all[i], jnp.asarray(x), A=A_raw, sigma=sigma, step=step)))
        w1 = emd(x, x_)
        append_csv(csv, f'{i},ground-truth,,{log_px},{log_py},{w1}')
        done.add((str(i), 'ground-truth', ''))
        print(f'GT[{i}]:', log_px, log_py, w1, flush=True)

    # Guided SDA sampling, vmapped over observation vectors.
    runpath = PATH / f'runs/{run}'
    module, params, config = load_score(runpath, local=local)
    score = make_trajectory_eps(module, params, local, config.get('window', 5))

    def make_sampler(C):
        def sample_one(key, y):
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
            return sde.sample(key, (samples,), steps=steps, corrections=C, tau=0.25)

        return jax.jit(jax.vmap(sample_one))

    for C in corrections:
        todo = [i for i in indices if (str(i), run, str(C)) not in done]
        if not todo:
            continue

        sampler = make_sampler(C)

        for lo in range(0, len(todo), block):
            blk = todo[lo:lo + block]
            keys = jnp.stack([
                jax.random.fold_in(jax.random.key(1000 + i), C) for i in blk
            ])
            xs = sampler(keys, y_all[jnp.asarray(blk)])
            xs = chain.postprocess(xs)  # (B, samples, 65, 3)

            log_px = jnp.mean(jax.vmap(log_prior)(xs), axis=-1)
            log_py = jnp.mean(
                jax.vmap(
                    lambda y, x: log_likelihood(y, x, A=A_raw, sigma=sigma, step=step)
                )(y_all[jnp.asarray(blk)], xs),
                axis=-1,
            )

            for j, i in enumerate(blk):
                _, x_ = bpf_pairs[i]
                w1 = emd(np.asarray(xs[j]), x_)
                append_csv(csv, f'{i},{run},{C},{float(log_px[j])},{float(log_py[j])},{w1}')
                print(f'{run}[{i}] C={C:02d}:', float(log_px[j]), float(log_py[j]), w1, flush=True)


def parse_indices(spec: str):
    out = []
    for part in spec.split(','):
        if '-' in part:
            a, b = part.split('-')
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('command', choices=['observations', 'evaluate'])
    parser.add_argument('--run', type=str, default='local_0')
    parser.add_argument('--local', action='store_true', default=True)
    parser.add_argument('--global', dest='local', action='store_false')
    parser.add_argument('--freq', choices=['lo', 'hi'], default='lo')
    parser.add_argument('--indices', type=str, default='0',
                        help="e.g. '0-15' or '0,3,7' (reference runs 0-63)")
    parser.add_argument('--samples', type=int, default=1024)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--block', type=int, default=16,
                        help='indices evaluated per on-device batch')
    parser.add_argument('--corrections', type=str, default='0,1,2,4,8,16',
                        help='comma-separated Langevin correction counts')
    args = parser.parse_args()

    if args.command == 'observations':
        make_observations()
    else:
        evaluate(
            args.run, args.local, args.freq, parse_indices(args.indices),
            args.samples, args.steps,
            corrections=tuple(int(c) for c in args.corrections.split(',')),
            block=args.block,
        )
