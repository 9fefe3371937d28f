#!/usr/bin/env python
r"""Lorenz posterior W1 vs. sampling steps: ddim vs. dpm2m (VERDICT r3 #4).

The Lorenz leg of the solver curve: for one evaluation cell (freq ``lo``,
a single trajectory index), sample the guided posterior at steps
{16, 32, 64, 128, 256} with both predictors (``corrections=0`` — the regime
where dpm2m is live; with corrections it falls back to first-order by
design) and compare against the cached BPF ground truth via W1, log-prior
and log-likelihood — the same statistics as the main grid
(reference ``experiments/lorenz/eval.py:58-94``; sampler budget
``sda/score.py:225``).

Appends to ``storage/results/solver_sweep.csv``:
``index,run,solver,steps,log_prior,log_lik,w1``
Rows already present are skipped.
"""

import argparse

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from utils import (
    PATH,
    load_score,
    log_likelihood,
    log_prior,
    make_chain,
    make_trajectory_eps,
)

from eval import ensure_bpf, freq_params

from sda_tpu.diffusion import GaussianScore, VPSDE
from sda_tpu.eval import emd
from sda_tpu.train import append_csv, existing_csv_keys


def main(run: str, local: bool, index: int, samples: int, steps_grid):
    csv = PATH / 'results/solver_sweep.csv'
    done = existing_csv_keys(csv, 4)

    chain = make_chain()
    sigma, step = freq_params('lo')
    A_raw = lambda x: chain.preprocess(x)[..., :1]

    with h5py.File(PATH / 'results/obs.h5', mode='r') as f:
        y = jnp.asarray(f['lo'][index], dtype=jnp.float32)

    _, x_bpf = ensure_bpf('lo', [index], samples=samples)[index]

    module, params, config = load_score(PATH / f'runs/{run}', local=local)
    score = make_trajectory_eps(module, params, local, config.get('window', 5))

    for steps in steps_grid:
        for solver in ('ddim', 'dpm2m'):
            if (str(index), run, solver, str(steps)) in done:
                print(f'skip {solver} steps={steps} (done)')
                continue

            sde = VPSDE(
                eps=GaussianScore(
                    y=y,
                    A=lambda x: x[..., ::step, :1],
                    std=sigma,
                    sde=VPSDE(eps=score, shape=()),
                    gamma=3e-2,
                ),
                shape=(65, 3),
            )
            key = jax.random.fold_in(jax.random.key(2000 + index), steps)
            xs = sde.sample(key, (samples,), steps=steps, corrections=0,
                            tau=0.25, solver=solver)
            xs = chain.postprocess(xs)

            log_px = float(jnp.mean(log_prior(xs)))
            log_py = float(jnp.mean(
                log_likelihood(y, xs, A=A_raw, sigma=sigma, step=step)
            ))
            w1 = emd(np.asarray(xs), x_bpf)

            append_csv(
                csv,
                f'{index},{run},{solver},{steps},{log_px},{log_py},{w1}',
            )
            print(f'{solver} steps={steps}: log_prior {log_px:.2f}, '
                  f'log_lik {log_py:.2f}, W1 {w1:.3f}', flush=True)

    print(f'-> {csv}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='local_k2_0')
    parser.add_argument('--local', action='store_true', default=True)
    parser.add_argument('--global', dest='local', action='store_false')
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--samples', type=int, default=1024)
    parser.add_argument('--steps', type=str, default='16,32,64,128,256')
    args = parser.parse_args()

    main(args.run, args.local, args.index, args.samples,
         [int(s) for s in args.steps.split(',')])
