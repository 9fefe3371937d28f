#!/usr/bin/env python
r"""Kolmogorov data generation — sharded on-device ensemble simulation.

TPU-native counterpart of reference ``experiments/kolmogorov/generate.py``:
1024 trajectories of 128 steps at 256^2 (keeping the last 64), coarsened 4x
to 64^2, split 80/10/10 into HDF5. The reference fans this out as 1024
single-CPU Slurm jobs with a torch<->JAX boundary crossing per step; here
batches of trajectories run as one scanned spectral program per chunk,
vectorized over the ensemble (shard the chunk over a mesh for multi-chip).
"""

import argparse

import jax
import numpy as np

from utils import PATH, make_chain

from sda_tpu.dynamics import coarsen
from sda_tpu.train import save_h5


def main(
    trajectories: int = 1024,
    size: int = 256,
    length: int = 128,
    keep: int = 64,
    coarse: int = 4,
    chunk: int = 16,
    seed: int = 0,
    data: str = 'data',
    only: str = None,
):
    chain = make_chain(size=size)
    key = jax.random.key(seed)

    i = int(0.8 * trajectories)
    j = int(0.9 * trajectories)
    bounds = {'train': (0, i), 'valid': (i, j), 'test': (j, trajectories)}

    if only is None:
        wanted = list(bounds)
    else:
        wanted = only.split(',')
    lo = min(bounds[name][0] for name in wanted)
    # Simulate only the chunks that overlap [lo, trajectories); earlier
    # chunks just advance the PRNG key, so the produced split is
    # byte-identical to the same split of a full run (same seed).
    first = (lo // chunk) * chunk

    out = np.empty(
        (trajectories - first, keep, 2, size // coarse, size // coarse),
        dtype=np.float32,
    )

    @jax.jit
    def simulate(key):
        k_prior, k_traj = jax.random.split(key)
        x = chain.prior(k_prior, (chunk,))
        xs = chain.trajectory(k_traj, x, length=length)  # (length, chunk, ...)
        xs = xs[length - keep:]
        return coarsen(xs, coarse)

    for start in range(0, trajectories, chunk):
        key, sub = jax.random.split(key)
        if start < first:
            continue
        xs = np.asarray(simulate(sub))  # (keep, chunk, 2, h, w)
        out[start - first : start - first + chunk] = xs.transpose(1, 0, 2, 3, 4)
        print(f'{start + chunk}/{trajectories}', flush=True)

    for name in wanted:
        a, b = bounds[name]
        split = out[a - first : b - first]
        save_h5(PATH / f'{data}/{name}.h5', split)
        print(f'{name}: {split.shape}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--trajectories', type=int, default=1024)
    parser.add_argument('--size', type=int, default=256)
    parser.add_argument('--length', type=int, default=128)
    parser.add_argument('--keep', type=int, default=64)
    parser.add_argument('--coarse', type=int, default=4)
    parser.add_argument('--chunk', type=int, default=16)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--data', type=str, default='data',
                        help="output subdir under storage/ (e.g. 'data128' "
                             'for --coarse 2, keeping the 64^2 set intact)')
    parser.add_argument('--only', type=str, default=None,
                        help="comma-separated splits to produce (e.g. "
                             "'test'); earlier trajectories only advance "
                             'the PRNG, so the split matches a full run')
    args = parser.parse_args()

    main(
        args.trajectories, args.size, args.length,
        args.keep, args.coarse, args.chunk, args.seed, args.data,
        only=args.only,
    )
