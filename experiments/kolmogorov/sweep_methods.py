#!/usr/bin/env python
r"""Quantitative SDA-vs-DPS sweep over the assimilation scenario catalog.

Counterpart of reference ``experiments/kolmogorov/figures_bis.ipynb`` cells
5-10, which compare DPS guidance (Chung et al. 2022, ``sda/score.py:303``)
against SDA's variance-inflated Gaussian guidance (``sda/score.py:347``)
across observation scenarios — but as a CSV of numbers instead of
side-by-side images: per (scenario, method) the observation-residual ratio
(residual std / obs std, ~1 means the posterior explains the observations
at the noise level) and the posterior ensemble's energy-spectrum distance
to the test distribution (physical plausibility; DPS posteriors can fit
the observation while leaving the unobserved scales unphysical).

Appends to ``storage/results/method_sweep.csv``:
``scenario,method,run,residual,obs_std,residual_ratio,post_spec_dist``
Rows already present are skipped (idempotent re-runs).
"""

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from utils import PATH

from assimilate import assimilate

from sda_tpu.eval import spectrum_distance
from sda_tpu.train import append_csv, existing_csv_keys, load_h5

SCENARIOS = (
    ('coarse', {}),
    ('subsample', {'stride': 8}),
    ('subsample', {'stride': 16, 'offset': 7}),
    ('patch', {}),
    ('saturation', {}),
    ('vorticity', {}),
    ('extrapolate', {}),
)


def label_of(scenario: str, kwargs: dict) -> str:
    if scenario == 'subsample':
        stride, offset = kwargs.get('stride', 8), kwargs.get('offset', 0)
        return f'subsample_{offset}s{stride}' if offset else f'subsample_s{stride}'
    return scenario


def main(run: str, samples: int, steps: int, corrections: int, seed: int,
         only: str = None):
    csv = PATH / 'results/method_sweep.csv'
    done = existing_csv_keys(csv, 3)

    x_test = load_h5(PATH / 'data/test.h5')
    test_frames = jnp.asarray(x_test[:, ::8].reshape(-1, 2, 64, 64))

    for scenario, kwargs in SCENARIOS:
        label = label_of(scenario, kwargs)
        if only is not None and label not in only.split(','):
            continue
        for method in ('sda', 'dps'):
            if (label, method, run) in done:
                print(f'skip {label} {method} (done)')
                continue

            residual, std, xs = assimilate(
                run, scenario, samples=samples, steps=steps,
                corrections=corrections, seed=seed, render=False,
                method=method, **kwargs,
            )

            frames = np.asarray(xs).reshape(-1, 2, 64, 64)
            spec = spectrum_distance(jnp.asarray(frames), test_frames)

            append_csv(
                csv,
                f'{label},{method},{run},{residual:.5f},{std},'
                f'{residual / std:.3f},{spec:.4f}',
            )
            print(f'{label} {method}: residual/std {residual / std:.3f}, '
                  f'spectrum distance {spec:.4f}', flush=True)

    print(f'-> {csv}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument('--samples', type=int, default=4)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--corrections', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--only', type=str, default=None,
                        help='comma-separated scenario labels to run')
    args = parser.parse_args()

    main(args.run, args.samples, args.steps, args.corrections, args.seed,
         only=args.only)
