#!/usr/bin/env python
r"""Guidance-knob sweep for the residual-ratio question (VERDICT r3 weak #2).

The coarse-scenario posterior residual ratio has sat at ~1.11-1.12 across
all three seeds. This sweeps the three guidance knobs — Langevin correction
count, corrector step size tau, and the variance-inflation gamma
(reference defaults: corrections 1, tau 0.5, gamma 1e-2;
``sda/score.py:225,373`` + figures.ipynb cells 9-10) — and records the
residual ratio and posterior spectrum distance per configuration, so the
question "is 1.1 a knob artifact or the floor for this operator?" gets a
table instead of a guess.

Appends to ``storage/results/guidance_sweep.csv``:
``scenario,run,corrections,tau,gamma,steps,residual,obs_std,residual_ratio,post_spec_dist``
Rows already present are skipped (idempotent).
"""

import argparse

import jax.numpy as jnp
import numpy as np

from utils import PATH

from assimilate import assimilate

from sda_tpu.eval import spectrum_distance
from sda_tpu.train import append_csv, existing_csv_keys, load_h5

# (corrections, tau, gamma): the reference default, the stranded round-3
# tau/corrections legs, and a gamma axis around the notebook value.
GRID = (
    (1, 0.5, 1e-2),   # production default (the 1.11 cell)
    (2, 0.25, 1e-2),
    (2, 0.5, 1e-2),
    (4, 0.25, 1e-2),
    (4, 0.5, 1e-2),
    (1, 0.5, 3e-3),
    (1, 0.5, 3e-2),
    (1, 0.5, 1e-1),
    (4, 0.5, 3e-3),
)


def main(run: str, scenario: str, samples: int, steps: int, seed: int):
    csv = PATH / 'results/guidance_sweep.csv'
    done = existing_csv_keys(csv, 6)

    x_test = load_h5(PATH / 'data/test.h5')
    test_frames = jnp.asarray(x_test[:, ::8].reshape(-1, 2, 64, 64))

    for corrections, tau, gamma in GRID:
        key = (scenario, run, str(corrections), str(tau), str(gamma), str(steps))
        if key in done:
            print(f'skip C={corrections} tau={tau} gamma={gamma} (done)')
            continue

        residual, std, xs = assimilate(
            run, scenario, samples=samples, steps=steps,
            corrections=corrections, tau=tau, gamma=gamma, seed=seed,
            render=False,
        )

        frames = np.asarray(xs).reshape(-1, 2, 64, 64)
        spec = spectrum_distance(jnp.asarray(frames), test_frames)

        append_csv(
            csv,
            f'{scenario},{run},{corrections},{tau},{gamma},{steps},'
            f'{residual:.5f},{std},{residual / std:.3f},{spec:.4f}',
        )
        print(f'C={corrections} tau={tau} gamma={gamma}: '
              f'residual/std {residual / std:.3f}, spectrum {spec:.4f}',
              flush=True)

    print(f'-> {csv}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument('--scenario', type=str, default='coarse')
    parser.add_argument('--samples', type=int, default=4)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    main(args.run, args.scenario, args.samples, args.steps, args.seed)
