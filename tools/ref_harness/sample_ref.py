#!/usr/bin/env python
r"""Diagnostic: run the UNMODIFIED reference guided sampler (torch) on the
'lo' observation of a given index, at reduced settings, and save the samples
for metric comparison against our fused sampler at identical settings.

Usage: python sample_ref.py [index] [samples] [steps] [corrections]
"""

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, '/root/reference')

import h5py
import numpy as np
import torch

torch.manual_seed(0)
torch.set_num_threads(1)

from sda.score import GaussianScore, MCScoreNet, VPSDE  # noqa: E402
from sda.mcs import NoisyLorenz63  # noqa: E402

STORAGE = Path('/root/repo/experiments/lorenz/storage')


def main(index=0, samples=128, steps=64, corrections=4):
    with h5py.File(STORAGE / 'results/obs.h5') as f:
        y = torch.from_numpy(f['lo'][index]).float()

    sigma, step = 0.05, 8

    score = MCScoreNet(
        features=3, order=2, embedding=32,
        hidden_features=[256] * 5, activation=torch.nn.SiLU,
    )
    score.load_state_dict(torch.load(HERE / 'out/state.pth', map_location='cpu'))
    score.eval()

    sde = VPSDE(
        GaussianScore(
            y=y,
            A=lambda x: x[..., ::step, :1],
            std=sigma,
            sde=VPSDE(score, shape=()),
            gamma=3e-2,
        ),
        shape=(65, 3),
    )

    x = sde.sample((samples,), steps=steps, corrections=corrections, tau=0.25)
    x = NoisyLorenz63(dt=0.025).postprocess(x)

    out = HERE / f'out/ref_samples_i{index}_s{steps}_c{corrections}.npy'
    np.save(out, x.numpy())
    print(f'saved {out}')


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
