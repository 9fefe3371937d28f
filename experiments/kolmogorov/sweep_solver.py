#!/usr/bin/env python
r"""Posterior quality vs. sampling steps: ddim vs. dpm2m (VERDICT r3 #4).

The second-order multistep predictor (``VPSDE.sample(solver='dpm2m')``) is
order-validated on CPU toys (``tests/test_sde.py``); this sweep measures
what it buys **on the real experiment**: for the ``coarse`` assimilation
scenario, the observation-residual ratio and the posterior ensemble's
energy-spectrum distance at steps {32, 64, 128, 256} for both solvers.
``corrections=0`` throughout — with Langevin corrections dpm2m falls back
to first-order by design (every history point predates a stochastic kick),
so 0 corrections is the regime where the solver choice is live.

Reference budget being beaten: ``sda/score.py:225`` samples at steps
256-512; a solver that reaches the same residual/spectrum at half the steps
halves the wall clock of every guided program (and fits the axon worker's
wall-clock ceiling at larger sample counts — the loop-closure enabler).

Appends to ``storage/results/solver_sweep.csv``:
``scenario,solver,steps,run,residual,obs_std,residual_ratio,post_spec_dist,wall_s``
(``wall_s`` includes compilation for the first run of each (solver, steps)
program — comparisons should use the residual/spectrum columns). Rows
already present are skipped (idempotent re-runs).
"""

import argparse
import time

import jax.numpy as jnp
import numpy as np

from utils import PATH

from assimilate import assimilate

from sda_tpu.eval import spectrum_distance
from sda_tpu.train import append_csv, existing_csv_keys, load_h5


def main(run: str, scenario: str, samples: int, seed: int, steps_grid):
    csv = PATH / 'results/solver_sweep.csv'
    done = existing_csv_keys(csv, 4)

    x_test = load_h5(PATH / 'data/test.h5')
    test_frames = jnp.asarray(x_test[:, ::8].reshape(-1, 2, 64, 64))

    for steps in steps_grid:
        for solver in ('ddim', 'dpm2m'):
            if (scenario, solver, str(steps), run) in done:
                print(f'skip {solver} steps={steps} (done)')
                continue

            t0 = time.perf_counter()
            residual, std, xs = assimilate(
                run, scenario, samples=samples, steps=steps,
                corrections=0, seed=seed, render=False, solver=solver,
            )
            wall = time.perf_counter() - t0

            frames = np.asarray(xs).reshape(-1, 2, 64, 64)
            spec = spectrum_distance(jnp.asarray(frames), test_frames)

            append_csv(
                csv,
                f'{scenario},{solver},{steps},{run},{residual:.5f},{std},'
                f'{residual / std:.3f},{spec:.4f},{wall:.1f}',
            )
            print(f'{solver} steps={steps}: residual/std {residual / std:.3f}, '
                  f'spectrum distance {spec:.4f}, wall {wall:.1f}s', flush=True)

    print(f'-> {csv}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument('--scenario', type=str, default='coarse')
    parser.add_argument('--samples', type=int, default=4)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--steps', type=str, default='32,64,128,256',
                        help='comma-separated step counts')
    args = parser.parse_args()

    main(args.run, args.scenario, args.samples, args.seed,
         [int(s) for s in args.steps.split(',')])
