#!/usr/bin/env python
r"""Kolmogorov zero-shot assimilation — the notebook scenario catalog.

TPU-native counterpart of the reference's notebook experiments
(``experiments/kolmogorov/figures.ipynb`` cells 4-43, ``figures_bis.ipynb``
cells 5-10 — SURVEY.md §2 C39): each scenario defines an observation
operator ``A``, builds the guided sampler over the full trajectory, samples,
and checks the posterior-consistency residual ``std(A(x) - y) ~ std``.

Scenarios (reference cell in parentheses):
- ``coarse``:      8x-coarsened observations every 4th frame (cells 9-10)
- ``subsample``:   every k-th pixel of an 8-frame burst, ``--stride``
                   2/4/8/16 and ``--offset`` (cells 30-39; offset 7::16 is
                   figures_bis.ipynb cells 9-10)
- ``extrapolate``: coarsen 4x THEN an 8x8 patch of the 16x16 coarse grid,
                   every 3rd frame — conditions only on a sub-region, the
                   rest is extrapolated (cell 16, figures_bis.ipynb cell 5)
- ``patch``:       a centered full-resolution spatial patch, 3-frame stride
- ``saturation``:  nonlinear observation process (cell 23): 4x-coarsen every
                   3rd frame, vorticity, saturate w/(1+|w|), central 12x12
                   patch
- ``loop``:        loop closure A(x) = x[0] - x[-1], y = 0 (cell 43)
- ``vorticity``:   masked vorticity conditioning of a real trajectory
- ``circle``:      the paper's cover demo (cells 4-6): condition the LAST
                   frame's vorticity on a synthetic ring, then check physical
                   plausibility by re-simulating the sampled initial frame
                   with the spectral solver at 256^2
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, load_score, make_trajectory_eps

from sda_tpu.diffusion import DPSGaussianScore, GaussianScore, VPSDE
from sda_tpu.dynamics import coarsen, vorticity
from sda_tpu.train import load_h5


def get_scenario(name: str, x_star, rng, stride: int = 8, offset: int = 0,
                 length_override: int = None):
    r"""Returns ``(A, y, std, length, gamma)`` for a named scenario.

    ``x_star`` is a reference trajectory ``(L, 2, size, size)`` in model
    space. The reference only ever models 64^2 fields; here the scenario
    geometry is *size-relative* (patch extents scale with the grid) so the
    same catalog drives 128^2-native models — at ``size=64`` every operator
    reduces exactly to the reference's notebook values (cited per scenario).
    """

    size = x_star.shape[-1]

    if name == 'coarse':
        length = min(32, x_star.shape[0])
        std = 0.1
        A = lambda x: coarsen(x[..., ::4, :, :, :], 8)
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'subsample':
        # Reference figures.ipynb cells 30-41 (strides 2/4/8/16, std 0.1)
        # and figures_bis.ipynb cells 9-10 (offset grid 7::16).
        length = 8
        std = 0.1
        A = lambda x: x[..., offset::stride, offset::stride]
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'extrapolate':
        # Reference figures.ipynb cell 16: coarsen 4x (64 -> 16 grid), then
        # observe only the central 8x8 coarse patch of every 3rd frame —
        # the posterior must extrapolate the unobserved 3/4 of the domain.
        length = 8
        std = 0.01
        g = size // 4  # coarse grid; central half-extent patch (4:12 at 64^2)
        A = lambda x: coarsen(x, 4)[..., ::3, :, g // 4: 3 * g // 4, g // 4: 3 * g // 4]
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'patch':
        length = 16
        std = 0.05
        lo, hi = 3 * size // 8, 5 * size // 8  # central quarter (24:40 at 64^2)
        A = lambda x: x[..., ::3, :, lo:hi, lo:hi]
        y = A(x_star[:length]) + std * rng.standard_normal(
            A(x_star[:length]).shape
        ).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'saturation':
        # Reference figures.ipynb cell 23 exactly: coarsen 4x every 3rd
        # frame, vorticity, saturate w/(1+|w|), observe the central 12x12
        # coarse patch.
        length = 8
        std = 0.05

        g = size // 4  # coarse grid; central 3/4-extent patch (2:14 at 64^2)

        def A(x):
            w = vorticity(coarsen(x[..., ::3, :, :, :], 4))
            w = w / (1 + jnp.abs(w))
            return w[..., g // 8: g - g // 8, g // 8: g - g // 8]

        y = np.asarray(A(jnp.asarray(x_star[:length])))
        y = y + std * rng.standard_normal(y.shape).astype(np.float32)
        return A, jnp.asarray(y), std, length, 1e-2

    if name == 'circle':
        # Reference figures.ipynb cell 4: a synthetic ring target for the
        # last frame's vorticity — pure "dream up a flow whose vorticity
        # draws a circle" conditioning; y is NOT derived from data.
        length = 8
        std = 0.2
        grid = np.linspace(-1, 1, size, dtype=np.float32)
        dist = grid[:, None] ** 2 + grid[None, :] ** 2
        mask = jnp.asarray((0.4 < dist) & (dist < 0.6), dtype=jnp.float32)
        A = lambda x: vorticity(x[..., -1, :, :, :]) * mask
        return A, 0.6 * mask, std, length, 1e-2

    if name == 'loop':
        # Reference scale (figures.ipynb cell 43): a CLOSED loop of 127
        # frames — generative trajectory length is arbitrary at inference,
        # well beyond the 64-frame training data. ``length`` is overridable
        # (--length): 127 is prime, so sequence-parallel runs (--mesh sp=N)
        # need a length divisible by the shard count, e.g. 128.
        length = length_override or 127
        std = 1e-2
        A = lambda x: x[..., 0, :, :, :] - x[..., -1, :, :, :]
        y = jnp.zeros((2, size, size))
        return A, y, std, length, 1e-1

    if name == 'vorticity':
        length = 8
        std = 0.1

        def A(x):
            return vorticity(x)

        y = np.asarray(A(jnp.asarray(x_star[:length])))
        y = y + std * rng.standard_normal(y.shape).astype(np.float32)
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
    chunk: int = None,
    remat: bool = False,
    method: str = 'sda',
    stride: int = 8,
    offset: int = 0,
    mesh: str = None,
    length: int = None,
    save: bool = False,
    solver: str = 'ddim',
    bf16: bool = None,
    gamma: float = None,
    data: str = 'data',
    segments: int = 1,
):
    rng = np.random.RandomState(seed)

    x_test = load_h5(PATH / f'{data}/test.h5')
    x_star = x_test[seed % len(x_test)]  # (64, 2, size, size)
    size = x_star.shape[-1]

    A, y, std, length, scenario_gamma = get_scenario(
        scenario, x_star, rng, stride, offset, length_override=length
    )
    # Variance-inflation override (reference default 1e-2, sda/score.py:373;
    # per-scenario values from the notebooks) — the sweep knob for the
    # residual-ratio question (VERDICT r3 weak #2).
    gamma = scenario_gamma if gamma is None else gamma

    if mesh is not None:
        # e.g. --mesh sp=4 or --mesh dp=2,sp=4: sequence-parallel scoring of
        # the trajectory axis with halo exchange (ShardedMCScoreNet).
        from sda_tpu.parallel import make_mesh

        axes = {k: int(v) for k, v in (kv.split('=') for kv in mesh.split(','))}
        mesh = make_mesh(axes)

    # Compute-dtype override (None = follow the run's config.json, whose
    # production value is bf16: network compute bf16, params and the
    # guidance Tweedie/VJP math f32). --f32 forces full f32 for apples-to-
    # apples precision checks; the residual printed below is the gate.
    override = {} if bf16 is None else {'bf16': bf16}
    module, params, config = load_score(PATH / f'runs/{run}', **override)
    score = make_trajectory_eps(
        module, params, config.get('window', 5), chunk=chunk, mesh=mesh,
        remat=remat,
    )

    if method == 'sda':
        guided = GaussianScore(
            y=y, A=A, std=std,
            sde=VPSDE(eps=score, shape=()),
            gamma=gamma,
            remat=remat,
        )
    elif method == 'dps':
        # DPS baseline (Chung et al. 2022), reference sda/score.py:303-344;
        # compared against SDA guidance in figures_bis.ipynb.
        guided = DPSGaussianScore(
            y=y, A=A, sde=VPSDE(eps=score, shape=()), zeta=1.0
        )
    else:
        raise ValueError(f'unknown guidance method {method}')

    sde = VPSDE(eps=guided, shape=(length, 2, size, size))

    key = jax.random.key(seed)
    if segments > 1:
        # Segmented sampling: the same reverse-diffusion grid, executed as
        # `segments` consecutive XLA programs (bitwise-identical to one full
        # run — the per-step PRNG folds in the global step index). This is
        # the wall-clock lever for the axon worker, which kills single
        # programs that run too long (CLAUDE.md); the 256^2-native runs
        # need it.
        import time as _time

        bounds = np.linspace(0, steps, segments + 1).astype(int)
        xs = None
        for i0, i1 in zip(bounds[:-1], bounds[1:]):
            t0 = _time.perf_counter()
            xs = sde.sample(
                key, (samples,), steps=steps, corrections=corrections,
                tau=tau, solver=solver, init=xs, segment=(int(i0), int(i1)),
            )
            xs = jax.block_until_ready(xs)
            print(f'segment {i0}:{i1} done in '
                  f'{_time.perf_counter() - t0:.1f}s', flush=True)
    else:
        xs = sde.sample(key, (samples,), steps=steps, corrections=corrections,
                        tau=tau, solver=solver)

    # Posterior-consistency check (reference figures.ipynb cells 11/18/25).
    residual = float(jnp.std(A(xs) - y))
    label = scenario
    if scenario == 'subsample':
        label = f'subsample_{offset}s{stride}' if offset else f'subsample_s{stride}'
    print(f'{label}[{method}]: residual std = {residual:.4f} (obs std = {std})')

    if save:
        suffix = '' if method == 'sda' else f'_{method}'
        out = PATH / f'results/samples_{label}_{run}{suffix}.npz'
        out.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            out, xs=np.asarray(xs, np.float32),
            x_star=np.asarray(x_star[:length], np.float32),
        )
        print(f'saved {out}')

    if render:
        from utils import draw

        w = np.asarray(vorticity(xs[:, :: max(length // 8, 1)]))
        suffix = '' if method == 'sda' else f'_{method}'
        out = PATH / f'results/{label}_{run}{suffix}.png'
        out.parent.mkdir(parents=True, exist_ok=True)
        draw(w).save(out)
        print(f'rendered {out}')

    if scenario == 'circle':
        # Physical-plausibility check (reference figures.ipynb cell 6):
        # upsample the sampled initial frame to the native 256^2 grid,
        # re-simulate with the spectral solver, coarsen back, and compare
        # the simulated frames with the sampled ones.
        from utils import make_chain

        from sda_tpu.dynamics import upsample

        chain = make_chain(256)
        factor = 256 // size
        y0 = upsample(xs[0, 0], factor)
        sim = chain.trajectory(jax.random.key(0), y0, length=length - 1)
        sim = coarsen(jnp.concatenate([y0[None], sim]), factor)

        num = float(jnp.sum(sim * xs[0]))
        den = float(jnp.linalg.norm(sim) * jnp.linalg.norm(xs[0]))
        print(f'circle: sim-vs-sample correlation = {num / den:.4f}')

        if render:
            w = np.asarray(vorticity(jnp.stack([xs[0], sim])))
            out = PATH / f'results/circle_sim_{run}.png'
            draw(w).save(out)
            print(f'rendered {out} (row 0: sampled, row 1: re-simulated)')

    return residual, std, xs


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', type=str, default='unet_0')
    parser.add_argument(
        '--scenario',
        default='coarse',
        choices=['coarse', 'subsample', 'extrapolate', 'patch', 'saturation',
                 'loop', 'vorticity', 'circle'],
    )
    parser.add_argument('--samples', type=int, default=4)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--corrections', type=int, default=1)
    parser.add_argument('--tau', type=float, default=0.5)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--chunk', type=int, default=None,
                        help='evaluate score windows in sequential chunks (HBM lever)')
    parser.add_argument('--remat', action='store_true',
                        help='rematerialize the score net inside the guidance VJP')
    parser.add_argument('--method', choices=['sda', 'dps'], default='sda',
                        help='guidance: SDA variance-inflated or DPS baseline')
    parser.add_argument('--stride', type=int, default=8,
                        help='subsample scenario: pixel stride (2/4/8/16)')
    parser.add_argument('--offset', type=int, default=0,
                        help='subsample scenario: grid offset (e.g. 7 for 7::16)')
    parser.add_argument('--mesh', type=str, default=None,
                        help="sequence-parallel mesh, e.g. 'sp=4' (trajectory "
                             'length must divide by sp, chunks must hold a window)')
    parser.add_argument('--length', type=int, default=None,
                        help='loop scenario: trajectory length override')
    parser.add_argument('--no-render', dest='render', action='store_false',
                        default=True)
    parser.add_argument('--save', action='store_true',
                        help='save posterior samples + truth to results/*.npz')
    parser.add_argument('--solver', default='ddim', choices=['ddim', 'dpm2m'],
                        help='predictor: reference-parity ddim or the '
                             'second-order multistep dpm2m (same cost/step; '
                             'second order needs --corrections 0 — with '
                             'Langevin corrections it falls back to ddim)')
    parser.add_argument('--bf16', dest='bf16', action='store_true',
                        default=None,
                        help='force bf16 network compute (default: follow '
                             'the run config; params/guidance stay f32)')
    parser.add_argument('--f32', dest='bf16', action='store_false',
                        help='force full-f32 network compute')
    parser.add_argument('--gamma', type=float, default=None,
                        help='variance-inflation override (default: the '
                             "scenario's notebook value, e.g. 1e-2 for "
                             'coarse)')
    parser.add_argument('--data', type=str, default='data',
                        help="dataset subdir under storage/ ('data128' for "
                             'the 128^2-native dataset)')
    parser.add_argument('--segments', type=int, default=1,
                        help='execute the reverse-diffusion grid as N '
                             'consecutive XLA programs (bitwise-identical '
                             'result; keeps per-program wall under the axon '
                             "worker's kill ceiling for 256^2-native runs)")
    args = parser.parse_args()

    assimilate(
        args.run, args.scenario, args.samples,
        args.steps, args.corrections, args.tau, args.seed,
        render=args.render,
        chunk=args.chunk, remat=args.remat, method=args.method,
        stride=args.stride, offset=args.offset, mesh=args.mesh,
        length=args.length, save=args.save, solver=args.solver,
        bf16=args.bf16, gamma=args.gamma, data=args.data,
        segments=args.segments,
    )
