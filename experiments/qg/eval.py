#!/usr/bin/env python
r"""QG quantitative evaluation: generative + posterior fidelity gates.

The Kolmogorov pack gates fidelity with ``eval.py`` (spectrum distance +
residual ratio); this is the QG counterpart, extended with a ground-truth
comparison across held-out trajectories — the reference's qg branch has no
quantitative evaluation at all, so the gate design follows the Lorenz
pipeline's structure (ground truth vs posterior ensemble, reference
``experiments/lorenz/eval.py:58-94``) with ensemble-calibration diagnostics
standard in data assimilation:

1. **Generative**: unconditional windows from the trained kernel vs
   held-out frames — isotropic energy-spectrum distance (both layers) and
   PV-moment ratio.
2. **Posterior, per held-out trajectory** (default: 8 test trajectories,
   ``upper`` scenario — only the coarsened upper-layer PV is observed):
   - observation residual / obs noise (the notebook criterion, ~1),
   - posterior-mean RMSE per layer vs the simulated truth (the bottom
     layer is fully latent — reconstructed only through the dynamical
     coupling between layers),
   - spread-skill ratio: ensemble spread x sqrt((S+1)/S) / RMSE (~1 for a
     calibrated ensemble),
   - posterior ensemble spectrum distance to the test distribution.

Appends to ``storage/results/eval.csv``:
``kind,run,scenario,index,residual_ratio,rmse_top,rmse_bottom,spread_skill,spec_dist``
(generative rows carry the PV std ratio in the residual_ratio column and
leave the rmse/spread columns empty).
Rows already present are skipped (idempotent re-runs).
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, load_score, make_trajectory_eps

from assimilate import get_scenario

from sda_tpu.diffusion import GaussianScore, VPSDE, bind_eps
from sda_tpu.eval import spectrum_distance
from sda_tpu.train import append_csv, existing_csv_keys, load_h5


def main(
    run: str,
    scenario: str = 'upper',
    indices=range(8),
    samples: int = 8,
    steps: int = 256,
    corrections: int = 1,
    tau: float = 0.5,
    seed: int = 0,
    gen_batch: int = 64,
    gen_steps: int = 128,
):
    csv = PATH / 'results/eval.csv'
    done = existing_csv_keys(csv, 4)

    x_test = load_h5(PATH / 'data/test.h5')  # (N, L, 2, H, W)
    test_frames = jnp.asarray(
        x_test[:, :: max(x_test.shape[1] // 8, 1)].reshape(
            -1, *x_test.shape[-3:]
        )
    )

    module, params, config = load_score(PATH / f'runs/{run}')
    window = config.get('window', 5)

    # 1. Generative gate: unconditional windows vs held-out frames.
    if ('generative', run, scenario, '') not in done:
        sde = VPSDE(
            eps=bind_eps(module, params),
            shape=(window * 2, *x_test.shape[-2:]),
        )
        xs = sde.sample(jax.random.key(seed), (gen_batch,), steps=gen_steps)
        frames = xs.reshape(gen_batch * window, 2, *x_test.shape[-2:])

        spec = float(spectrum_distance(frames, test_frames))
        std_ratio = float(jnp.std(frames) / jnp.std(test_frames))

        append_csv(csv, f'generative,{run},{scenario},,{std_ratio:.4f},,,,{spec:.4f}')
        print(f'generative: spectrum distance {spec:.4f}, '
              f'PV std ratio {std_ratio:.3f}', flush=True)

    # 2. Posterior gate across held-out trajectories.
    score = make_trajectory_eps(module, params, window)

    for i in indices:
        if ('posterior', run, scenario, str(i)) not in done:
            rng = np.random.RandomState(seed + 100 + i)
            x_star = x_test[i]

            A, y, std, length, gamma = get_scenario(scenario, x_star, rng)

            sde = VPSDE(
                eps=GaussianScore(
                    y=y, A=A, std=std, sde=VPSDE(eps=score, shape=()),
                    gamma=gamma,
                ),
                shape=(length, *x_star.shape[-3:]),
            )
            xs = sde.sample(
                jax.random.key(seed + 100 + i), (samples,),
                steps=steps, corrections=corrections, tau=tau,
            )

            residual_ratio = float(jnp.std(A(xs) - y)) / std

            truth = jnp.asarray(x_star[:length])
            mean = jnp.mean(xs, axis=0)
            rmse = jnp.sqrt(jnp.mean((mean - truth) ** 2, axis=(0, 2, 3)))
            spread = jnp.sqrt(jnp.mean(jnp.var(xs, axis=0, ddof=1)))
            skill = float(jnp.sqrt(jnp.mean((mean - truth) ** 2)))
            spread_skill = float(
                spread * np.sqrt((samples + 1) / samples) / skill
            )

            spec = float(
                spectrum_distance(
                    xs.reshape(-1, *x_star.shape[-3:]), test_frames
                )
            )

            append_csv(
                csv,
                f'posterior,{run},{scenario},{i},{residual_ratio:.4f},'
                f'{float(rmse[0]):.4f},{float(rmse[1]):.4f},'
                f'{spread_skill:.4f},{spec:.4f}',
            )
            print(
                f'posterior[{i}]: residual ratio {residual_ratio:.3f}, '
                f'rmse top/bottom {float(rmse[0]):.3f}/{float(rmse[1]):.3f}, '
                f'spread-skill {spread_skill:.3f}, spectrum {spec:.4f}',
                flush=True,
            )

    print(f'-> {csv}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='qg_0')
    parser.add_argument('--scenario', default='upper',
                        choices=['upper', 'coarse', 'subsample'])
    parser.add_argument('--indices', type=str, default='0-7',
                        help="e.g. '0-7' or '0,3'")
    parser.add_argument('--samples', type=int, default=8)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--corrections', type=int, default=1)
    parser.add_argument('--tau', type=float, default=0.5)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--gen-batch', type=int, default=64,
                        help='unconditional windows for the generative gate')
    parser.add_argument('--gen-steps', type=int, default=128)
    args = parser.parse_args()

    def parse_indices(spec):
        out = []
        for part in spec.split(','):
            if '-' in part:
                a, b = part.split('-')
                out.extend(range(int(a), int(b) + 1))
            else:
                out.append(int(part))
        return out

    main(
        args.run, args.scenario, parse_indices(args.indices),
        args.samples, args.steps, args.corrections, args.tau, args.seed,
        gen_batch=args.gen_batch, gen_steps=args.gen_steps,
    )
