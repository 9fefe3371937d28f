#!/usr/bin/env python
r"""Lorenz data generation — single on-device program.

TPU-native counterpart of reference ``experiments/lorenz/generate.py``: 1024
chains, 1024-step burn-in (last-only), 1024 recorded steps, standardization,
80/10/10 train/valid/test HDF5 splits. The reference runs this as a Slurm
job with a Python-level RK4 loop; here the whole ensemble rollout is one
jitted `lax.scan` program.
"""

import argparse

import jax
import numpy as np

from utils import PATH, make_chain

from sda_tpu.train import save_h5


def main(chains: int = 1024, length: int = 1024, burnin: int = 1024, seed: int = 0):
    chain = make_chain()
    key = jax.random.key(seed)
    k_prior, k_burn, k_traj = jax.random.split(key, 3)

    x = chain.prior(k_prior, (chains,))
    x = chain.trajectory(k_burn, x, length=burnin, last=True)
    x = chain.trajectory(k_traj, x, length=length)  # (length, chains, 3)
    x = chain.preprocess(x)
    x = np.asarray(x).transpose(1, 0, 2)  # (chains, length, 3)

    i = int(0.8 * len(x))
    j = int(0.9 * len(x))

    splits = {
        'train': x[:i],
        'valid': x[i:j],
        'test': x[j:],
    }

    for name, data in splits.items():
        save_h5(PATH / f'data/{name}.h5', data)
        print(f'{name}: {data.shape}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--chains', type=int, default=1024)
    parser.add_argument('--length', type=int, default=1024)
    parser.add_argument('--burnin', type=int, default=1024)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    main(args.chains, args.length, args.burnin, args.seed)
