#!/usr/bin/env python
r"""QG zero-shot assimilation — multi-field scenario catalog.

Counterpart of the Kolmogorov scenario catalog for the two-layer QG system.
The headline scenario is ``upper``: only the **upper-layer** PV is observed
(coarsened), and the posterior must reconstruct the unobserved bottom layer
through the layers' dynamical coupling — a genuinely multi-field inverse
problem the reference's qg branch targets (BASELINE.json config 5).

Scenarios:
- ``upper``:     4x-coarsened upper-layer PV of every 2nd frame; bottom
                 layer fully latent
- ``coarse``:    4x-coarsened both-layer observations every 2nd frame
- ``subsample``: every 8th pixel of both layers of an 8-frame burst
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, load_score, make_trajectory_eps

from sda_tpu.diffusion import GaussianScore, VPSDE
from sda_tpu.dynamics import coarsen
from sda_tpu.train import load_h5


def get_scenario(name: str, x_star, rng):
    r"""Returns ``(A, y, std, length, gamma)``; ``x_star`` is ``(L, 2, H, W)``
    in (standardized) model space."""

    if name == 'upper':
        length = 16
        std = 0.1
        A = lambda x: coarsen(x[..., ::2, :1, :, :], 4)
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'coarse':
        length = 16
        std = 0.1
        A = lambda x: coarsen(x[..., ::2, :, :, :], 4)
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'subsample':
        length = 8
        std = 0.1
        A = lambda x: x[..., ::8, ::8]
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    raise ValueError(f'unknown scenario {name}')


def assimilate(
    run: str,
    scenario: str,
    samples: int = 4,
    steps: int = 256,
    corrections: int = 1,
    tau: float = 0.5,
    seed: int = 0,
    render: bool = True,
):
    rng = np.random.RandomState(seed)

    x_test = load_h5(PATH / 'data/test.h5')
    x_star = x_test[seed % len(x_test)]  # (64, 2, 64, 64)

    A, y, std, length, gamma = get_scenario(scenario, x_star, rng)

    module, params, config = load_score(PATH / f'runs/{run}')
    score = make_trajectory_eps(module, params, config.get('window', 5))

    sde = VPSDE(
        eps=GaussianScore(
            y=y, A=A, std=std, sde=VPSDE(eps=score, shape=()), gamma=gamma
        ),
        shape=(length, *x_star.shape[-3:]),
    )

    key = jax.random.key(seed)
    xs = sde.sample(key, (samples,), steps=steps, corrections=corrections, tau=tau)

    # Posterior-consistency residual (the reference's notebook criterion).
    residual = float(jnp.std(A(xs) - y))
    print(f'{scenario}: residual std = {residual:.4f} (obs std = {std})')

    # For 'upper': report the error on the UNOBSERVED bottom layer too.
    if scenario == 'upper':
        err = float(
            jnp.sqrt(jnp.mean((jnp.mean(xs, axis=0) - x_star[:length]) ** 2, axis=(0, 2, 3)))[1]
        )
        base = float(jnp.std(x_star[:length, 1]))
        print(f'upper: bottom-layer posterior-mean rmse = {err:.3f} '
              f'(field std = {base:.3f})')

    if render:
        from utils import draw

        w = np.asarray(xs[0, :: max(length // 8, 1)])  # (frames, 2, H, W)
        scale = float(np.abs(w).max())
        out = PATH / f'results/{scenario}_{run}.png'
        out.parent.mkdir(parents=True, exist_ok=True)
        draw(np.swapaxes(w, 0, 1), vmin=-scale, vmax=scale).save(out)
        print(f'rendered {out}')

    return residual, std


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='qg_0')
    parser.add_argument('--scenario', default='upper',
                        choices=['upper', 'coarse', 'subsample'])
    parser.add_argument('--samples', type=int, default=4)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--corrections', type=int, default=1)
    parser.add_argument('--tau', type=float, default=0.5)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    assimilate(
        args.run, args.scenario, args.samples,
        args.steps, args.corrections, args.tau, args.seed,
    )
