#!/usr/bin/env python
r"""Kolmogorov paper-figure pack: sandwich plots, assimilation montages, GIFs.

Host-side counterpart of the reference's figure notebooks:

- ``sandwich.ipynb`` cells 1-3: a 3x3 vorticity montage of consecutive data
  frames, the diagonal "sandwich" stack, and its noisy variant.
- ``figures.ipynb`` cells 8/10 et al.: truth / observation / posterior-sample
  montages for each assimilation scenario whose samples were stored by
  ``assimilate.py --save`` (``results/samples_<label>_<run>.npz``).
- the README-style assimilation GIF (reference
  ``experiments/kolmogorov/utils.py:184-200`` ``save_gif``).

Rendering is pure host work: this CLI forces the CPU backend so it can run
while the TPU is busy, and only reads stored artifacts (no sampling).
"""

import jax

jax.config.update('jax_platforms', 'cpu')

import argparse

import numpy as np

from utils import PATH

from sda_tpu.dynamics import vorticity

from sda_tpu.viz import draw, sandwich, save_gif


def sandwich_figures(frames: int = 9) -> None:
    r"""Reference ``sandwich.ipynb``: consecutive coarsened data frames as a
    square montage, a mirrored sandwich stack, and a noisy sandwich."""

    from sda_tpu.train import load_h5

    x = load_h5(PATH / 'data/test.h5')[16, :frames]
    w = np.asarray(vorticity(x))

    side = int(np.sqrt(frames))
    out = PATH / 'results'
    out.mkdir(parents=True, exist_ok=True)

    draw(w[: side * side].reshape(side, side, *w.shape[-2:]), zoom=4).save(
        out / 'data_montage.png'
    )
    sandwich(w, mirror=True, zoom=3).save(out / 'sandwich.png')

    rng = np.random.RandomState(0)
    sandwich(0.7 * w + 0.4 * rng.standard_normal(w.shape), zoom=3).save(
        out / 'sandwich_noisy.png'
    )
    print(f'sandwich figures -> {out}/[data_montage|sandwich|sandwich_noisy].png')


def assimilation_figures(gif_dt: float = 0.2) -> None:
    r"""Per stored sample set (``assimilate.py --save``): truth and posterior
    montages (``figures.ipynb`` cells 8/10 parity) plus an animated GIF of
    the first posterior sample."""

    out = PATH / 'results'

    stored = sorted(out.glob('samples_*.npz'))
    if not stored:
        print('no stored samples (run assimilate.py --save first)')
        return

    for file in stored:
        name = file.stem[len('samples_') :]
        with np.load(file) as z:
            xs, x_star = z['xs'], z['x_star']

        # Montage stride: at most 8 frames per row.
        stride = max(1, x_star.shape[0] // 8)

        w_star = np.asarray(vorticity(x_star[::stride][:8]))
        draw(w_star, zoom=4).save(out / f'truth_{name}.png')

        w_post = np.asarray(vorticity(xs[0, ::stride][:8]))
        draw(w_post, zoom=4).save(out / f'posterior_{name}.png')

        w_traj = np.asarray(vorticity(xs[0]))
        save_gif(w_traj, out / f'assim_{name}.gif', dt=gif_dt, zoom=2)

        print(f'{name}: truth/posterior montages + GIF ({xs.shape[0]} samples, '
              f'{xs.shape[1]} frames)')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--skip-sandwich', action='store_true')
    parser.add_argument('--skip-assim', action='store_true')
    args = parser.parse_args()

    if not args.skip_sandwich:
        sandwich_figures()
    if not args.skip_assim:
        assimilation_figures()
