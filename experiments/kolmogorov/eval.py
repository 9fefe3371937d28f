#!/usr/bin/env python
r"""Kolmogorov quantitative evaluation: generative + posterior fidelity.

The reference evaluates Kolmogorov models qualitatively (sample images and
notebook residual checks). This adds the quantitative gate from BASELINE.md
("matched spectral/Wasserstein fidelity"):

1. **Generative**: sample unconditional 1-frame windows from the trained
   kernel and compare against test-set frames — isotropic energy-spectrum
   distance, vorticity-moment match, and the **Wasserstein gate**: the
   Sinkhorn W1 between generated and test frames, calibrated against the
   test-vs-test split distance (the finite-sample floor). The frame sets
   have unequal counts (``samples * window`` vs ``N_test * 8``), so the
   exact LAP path (:func:`sda_tpu.eval.emd`) does not apply — this is the
   on-device log-domain Sinkhorn's production case.
2. **Posterior**: run the ``coarse`` assimilation scenario and report the
   observation residual together with the posterior ensemble's spectrum
   distance to the test distribution.

Appends one CSV row per run to ``storage/results/eval.csv``:
``run,unconditional_spec_dist,vorticity_std_ratio,posterior_spec_dist,residual_ratio,w1_gen,w1_floor,w1_ratio``
(rows written before round 4 carry the first five columns only).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, load_score, make_trajectory_eps

from assimilate import assimilate, get_scenario

from sda_tpu.diffusion import GaussianScore, VPSDE, bind_eps
from sda_tpu.dynamics import coarsen, vorticity
from sda_tpu.eval import pairwise_distances, sinkhorn, spectrum_distance
from sda_tpu.train import append_csv, existing_csv_keys, load_h5


def wasserstein_gate(frames, test_frames):
    r"""Sinkhorn W1 of generated vs test frames, with the test-vs-test
    split distance as the calibration floor (``w1_ratio ~= 1`` means the
    model matches the data distribution up to finite-sample effects).

    Both distances use the SAME regularization (2% of the mean test-split
    pairwise distance) so the entropic bias largely cancels in the ratio.
    """

    half = test_frames.shape[0] // 2
    a, b = test_frames[:half], test_frames[half:]

    reg = 0.02 * float(jnp.mean(pairwise_distances(a, b)))

    w1_floor = float(sinkhorn(a, b, reg=reg))
    w1_gen = float(sinkhorn(frames, test_frames, reg=reg))

    return w1_gen, w1_floor, w1_gen / w1_floor


def main(run: str, samples: int = 64, steps: int = 128, seed: int = 0,
         data: str = 'data', force: bool = False):
    # Idempotent re-runs (reference @ensure pattern): a run already in the
    # CSV is skipped so a crashed session's restart cannot double rows.
    if not force and (run,) in existing_csv_keys(PATH / 'results/eval.csv', 1):
        print(f'{run}: row already in results/eval.csv, skipping '
              '(--force to re-evaluate)')
        return

    x_test = load_h5(PATH / f'{data}/test.h5')  # (N, 64, 2, size, size)
    size = x_test.shape[-1]
    test_frames = jnp.asarray(x_test[:, ::8].reshape(-1, 2, size, size))

    module, params, config = load_score(PATH / f'runs/{run}')
    window = config.get('window', 5)

    # 1. Unconditional windows from the trained kernel.
    sde = VPSDE(eps=bind_eps(module, params), shape=(window * 2, size, size))
    xs = sde.sample(jax.random.key(seed), (samples,), steps=steps)
    frames = xs.reshape(samples, window, 2, size, size).reshape(-1, 2, size, size)

    spec_dist = spectrum_distance(frames, test_frames)

    w_gen = np.asarray(vorticity(frames))
    w_ref = np.asarray(vorticity(test_frames))
    vort_ratio = float(w_gen.std() / w_ref.std())

    w1_gen, w1_floor, w1_ratio = wasserstein_gate(frames, test_frames)

    print(f'unconditional: spectrum distance {spec_dist:.4f}, '
          f'vorticity std ratio {vort_ratio:.3f}, '
          f'W1 {w1_gen:.3f} vs floor {w1_floor:.3f} (ratio {w1_ratio:.3f})')

    # 2. Posterior fidelity on the coarse scenario.
    rng = np.random.RandomState(seed)
    x_star = x_test[seed % len(x_test)]
    A, y, std, length, gamma = get_scenario('coarse', x_star, rng)

    score = make_trajectory_eps(module, params, window)
    post_sde = VPSDE(
        eps=GaussianScore(
            y=y, A=A, std=std, sde=VPSDE(eps=score, shape=()), gamma=gamma
        ),
        shape=(length, 2, size, size),
    )

    xs_post = post_sde.sample(
        jax.random.key(seed + 1), (4,), steps=256, corrections=1, tau=0.5
    )

    residual_ratio = float(jnp.std(A(xs_post) - y)) / std
    post_frames = xs_post.reshape(-1, 2, size, size)
    post_spec = spectrum_distance(post_frames, test_frames)

    print(f'posterior (coarse): spectrum distance {post_spec:.4f}, '
          f'residual/obs-noise ratio {residual_ratio:.3f}')

    append_csv(
        PATH / 'results/eval.csv',
        f'{run},{spec_dist},{vort_ratio},{post_spec},{residual_ratio},'
        f'{w1_gen},{w1_floor},{w1_ratio}',
    )


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument('--samples', type=int, default=64)
    parser.add_argument('--steps', type=int, default=128)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--data', type=str, default='data',
                        help="dataset subdir under storage/ ('data128' for "
                             'the 128^2-native dataset)')
    parser.add_argument('--force', action='store_true',
                        help='re-evaluate even if the run already has a row')
    args = parser.parse_args()

    main(args.run, args.samples, args.steps, args.seed, args.data, args.force)
