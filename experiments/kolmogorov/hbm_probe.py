#!/usr/bin/env python
r"""HBM-lever probe: compile-time memory curve and bounded execution trials.

Quantifies what the chunked-window + per-chunk-remat levers
(``MCScoreNet(chunk, remat=True)``) actually buy on the guided loop-closure
program (reference ``figures.ipynb`` cell 43 at ``(samples, 127, 2, 64, 64)``
— the largest shape in the reference's catalog):

- ``--compile-only``: lower + compile the full guided sampler for one
  ``(samples, chunk, remat)`` configuration and print the backend's memory
  analysis (peak/temp/argument bytes) as one JSON line — no execution, so
  it is safe at shapes whose plain path exceeds HBM (the compile error's
  reported usage is captured instead).
- default: execute the program with a small ``--steps`` (memory is
  steps-independent — the scan carry is one trajectory batch — so a short
  scan probes the same peak memory as the production 256-step program
  while staying under the axon worker's wall-clock ceiling) and print
  wall time + residual finiteness.

Driven by ``tools/hbm_bisect.sh``, which runs each trial in its own
process (a worker crash kills the process; the chip recovers for the next
trial) and assembles the STATUS.md table.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, load_score, make_trajectory_eps

from assimilate import get_scenario

from sda_tpu.diffusion import GaussianScore, VPSDE


def build(run: str, samples: int, length: int, chunk, remat: bool,
          steps: int, corrections: int, scenario: str = 'loop',
          data: str = 'data'):
    rng = np.random.RandomState(0)

    module, params, config = load_score(PATH / f'runs/{run}')
    size = config.get('size', 64)

    if scenario == 'loop':
        x_star = None  # loop closure needs no reference trajectory
        A, y, std, length, gamma = get_scenario('loop', None, rng,
                                                length_override=length)
    else:
        from sda_tpu.train import load_h5

        x_star = load_h5(PATH / f'{data}/test.h5')[0]
        A, y, std, length, gamma = get_scenario(scenario, x_star, rng,
                                                length_override=length)

    score = make_trajectory_eps(module, params, config.get('window', 5),
                                chunk=chunk, remat=remat)

    sde = VPSDE(
        eps=GaussianScore(
            y=y, A=A, std=std, sde=VPSDE(eps=score, shape=()), gamma=gamma,
        ),
        shape=(length, 2, size, size),
    )

    def program(key):
        return sde.sample(key, (samples,), steps=steps,
                          corrections=corrections, tau=0.5)

    return jax.jit(program)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument('--samples', type=int, default=16)
    parser.add_argument('--length', type=int, default=127)
    parser.add_argument('--chunk', type=int, default=None)
    parser.add_argument('--remat', action='store_true')
    parser.add_argument('--steps', type=int, default=8)
    parser.add_argument('--corrections', type=int, default=1)
    parser.add_argument('--compile-only', action='store_true')
    parser.add_argument('--scenario', type=str, default='loop',
                        help="scenario whose guided program to probe "
                             "('coarse' for the 256^2-native measurement)")
    parser.add_argument('--data', type=str, default='data',
                        help="dataset subdir ('data256' for 256^2-native)")
    args = parser.parse_args()

    out = {
        'run': args.run, 'scenario': args.scenario,
        'samples': args.samples, 'length': args.length,
        'chunk': args.chunk, 'remat': args.remat, 'steps': args.steps,
    }

    program = build(args.run, args.samples, args.length, args.chunk,
                    args.remat, args.steps, args.corrections,
                    scenario=args.scenario, data=args.data)
    key = jax.random.key(0)

    if args.compile_only:
        t0 = time.time()
        try:
            compiled = program.lower(key).compile()
            out['compile_s'] = round(time.time() - t0, 1)
            try:
                mem = compiled.memory_analysis()
                for field in (
                    'temp_size_in_bytes', 'argument_size_in_bytes',
                    'output_size_in_bytes', 'peak_memory_in_bytes',
                ):
                    val = getattr(mem, field, None)
                    if val is not None:
                        out[field.replace('_in_bytes', '_gb')] = round(
                            val / 2**30, 3
                        )
            except Exception as err:
                out['memory_analysis_error'] = str(err)[:200]
            out['status'] = 'compiled'
        except Exception as err:
            out['status'] = 'compile_failed'
            out['error'] = str(err)[:400]
    else:
        t0 = time.time()
        try:
            x = program(key)
            x.block_until_ready()
            out['wall_s'] = round(time.time() - t0, 1)
            out['finite'] = bool(jnp.all(jnp.isfinite(x)))
            out['status'] = 'executed'
        except Exception as err:
            out['status'] = 'exec_failed'
            out['error'] = str(err)[:400]

    print(json.dumps(out), flush=True)
    sys.exit(0 if out['status'] in ('compiled', 'executed') else 1)


if __name__ == '__main__':
    main()
