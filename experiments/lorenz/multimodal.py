#!/usr/bin/env python
r"""Lorenz multimodal-posterior demo — guided sampling vs. weak 4D-Var modes.

Counterpart of reference ``experiments/lorenz/figures.ipynb`` cells 10-15:
observe only the third coordinate (every 4th frame, sigma = 0.1) of a
49-frame trajectory — the (a, b) wings of the attractor are then ambiguous
and the posterior is genuinely multimodal. Guided SDA sampling covers the
modes in one batched run; classical weak 4D-Var (L-BFGS) converges to one
mode per initialization and is run from sampled starts to enumerate distinct
modes (reference cell 14's dedup criterion).

Writes ``results/multimodal_{run}.png`` and prints the mode count + the
posterior-consistency residual.
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import (
    PATH,
    load_score,
    make_chain,
    make_trajectory_eps,
    weak_4d_var,
)

from sda_tpu.diffusion import GaussianScore, VPSDE
from sda_tpu.train import load_h5


def main(
    run: str = 'global_0',
    local: bool = False,
    samples: int = 256,
    steps: int = 256,
    corrections: int = 2,
    tau: float = 0.5,
    var_starts: int = 32,
    seed: int = 0,
):
    chain = make_chain()
    rng = np.random.RandomState(seed)

    x_star = load_h5(PATH / 'data/test.h5')[0, :49]  # standardized space
    y_star = jnp.asarray(
        rng.normal(x_star[::4, 2:], 0.1), dtype=jnp.float32
    )

    sigma, step = 0.1, 4
    A_raw = lambda x: chain.preprocess(x)[..., 2:]

    module, params, config = load_score(PATH / f'runs/{run}', local=local)
    score = make_trajectory_eps(module, params, local, config.get('window', 5))

    sde = VPSDE(
        eps=GaussianScore(
            y=y_star,
            A=lambda x: x[..., ::step, 2:],
            std=sigma,
            sde=VPSDE(eps=score, shape=()),
        ),
        shape=(49, 3),
    )

    key = jax.random.key(seed)
    xa = sde.sample(key, (samples,), steps=steps, corrections=corrections, tau=tau)
    xa = chain.postprocess(xa)

    # Posterior-consistency: residual of the observed coordinate in
    # standardized space (the guidance operates there).
    res = float(jnp.std(chain.preprocess(xa)[:, ::step, 2:] - y_star))
    print(f'obs residual std = {res:.4f} (obs std = {sigma})')

    # Weak 4D-Var from sampled starts (raw space, as in reference cell 14);
    # dedup modes by pairwise distance.
    xb = []
    for i in range(var_starts):
        xb.append(weak_4d_var(
            xa[i], y_star, A=A_raw, sigma=sigma, step=step,
        ))
    xb = jnp.stack(xb)

    # Dedup modes by raw pairwise distance (reference cell 14, threshold 10).
    d2 = jnp.sum((xb[:, None] - xb[None]) ** 2, axis=(-1, -2))
    keep = []
    for i in range(xb.shape[0]):
        if all(float(d2[i, j]) >= 10.0 for j in keep):
            keep.append(i)
    modes = xb[jnp.asarray(keep)]
    print(f'weak 4D-Var found {len(keep)} distinct modes from {var_starts} starts')

    try:
        import matplotlib

        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        xa_np = np.asarray(xa)
        modes_np = np.asarray(modes)

        fig, axs = plt.subplots(1, 3, sharey=True, figsize=(7, 3))
        t_axis = np.arange(1, 50)
        for i, ax in enumerate(axs):
            ax.plot(xa_np[:, :, i].T, t_axis, color='C0', lw=0.5, alpha=0.08)
            for j in range(min(len(modes_np), 6)):
                ax.plot(modes_np[j, :, i], t_axis, lw=0.9, ls='--',
                        color=plt.cm.viridis(0.5 + 0.08 * j))
            ax.set_xlabel('abc'[i])
            ax.grid(alpha=0.3)
        axs[0].set_ylabel('frame')
        fig.tight_layout()
        out = PATH / f'results/multimodal_{run}.png'
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out, dpi=130)
        print(f'figure -> {out}')
    except Exception as err:
        print(f'figure skipped: {err}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='global_0')
    parser.add_argument('--local', action='store_true', default=False)
    parser.add_argument('--samples', type=int, default=256)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--corrections', type=int, default=2)
    parser.add_argument('--var-starts', type=int, default=32)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    main(args.run, args.local, args.samples, args.steps,
         args.corrections, var_starts=args.var_starts, seed=args.seed)
