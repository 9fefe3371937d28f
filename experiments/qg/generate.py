#!/usr/bin/env python
r"""QG data generation — batched on-device ensemble simulation.

Two-layer QG at 128^2 (dt=0.1): spin up through the baroclinic-instability
equilibration, record 64 frames, coarsen 2x to 64^2, standardize to unit
scale (the PV amplitude is O(5); the score model trains on O(1) data like
the other packs), split 80/10/10 into HDF5. The normalization scale is
stored next to the data (``data/scale.json``).
"""

import argparse
import json

import jax
import numpy as np

from utils import PATH, make_chain

from sda_tpu.dynamics import coarsen
from sda_tpu.train import save_h5


def main(
    trajectories: int = 1024,
    size: int = 128,
    burnin: int = 128,
    keep: int = 64,
    coarse: int = 2,
    chunk: int = 64,
    seed: int = 0,
):
    chain = make_chain(size=size)
    key = jax.random.key(seed)

    out = np.empty(
        (trajectories, keep, 2, size // coarse, size // coarse),
        dtype=np.float32,
    )

    @jax.jit
    def simulate(key):
        k_prior, k_burn, k_traj = jax.random.split(key, 3)
        x = chain.prior(k_prior, (chunk,))
        x = chain.trajectory(k_burn, x, length=burnin, last=True)
        xs = chain.trajectory(k_traj, x, length=keep)  # (keep, chunk, ...)
        return coarsen(xs, coarse)

    for start in range(0, trajectories, chunk):
        key, sub = jax.random.split(key)
        xs = np.asarray(simulate(sub))
        out[start : start + chunk] = xs.transpose(1, 0, 2, 3, 4)
        print(f'{start + chunk}/{trajectories}', flush=True)

    assert np.all(np.isfinite(out)), 'QG simulation produced non-finite states'

    # Standardize to unit scale (per-layer std over the whole set).
    scale = out.std(axis=(0, 1, 3, 4), keepdims=True)  # (1, 1, 2, 1, 1)
    out /= scale

    (PATH / 'data').mkdir(parents=True, exist_ok=True)
    (PATH / 'data/scale.json').write_text(
        json.dumps({'scale': scale.ravel().tolist()})
    )

    i = int(0.8 * trajectories)
    j = int(0.9 * trajectories)

    splits = {
        'train': out[:i],
        'valid': out[i:j],
        'test': out[j:],
    }

    for name, data in splits.items():
        save_h5(PATH / f'data/{name}.h5', data)
        print(f'{name}: {data.shape}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--trajectories', type=int, default=1024)
    parser.add_argument('--size', type=int, default=128)
    parser.add_argument('--burnin', type=int, default=128)
    parser.add_argument('--keep', type=int, default=64)
    parser.add_argument('--coarse', type=int, default=2)
    parser.add_argument('--chunk', type=int, default=64)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    main(
        args.trajectories, args.size, args.burnin,
        args.keep, args.coarse, args.chunk, args.seed,
    )
