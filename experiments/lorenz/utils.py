r"""Lorenz experiment helpers: factories, likelihoods, classical baselines.

TPU-native counterpart of reference ``experiments/lorenz/utils.py``: same
factory surface (``make_chain``, ``make_global_score``, ``make_local_score``,
``load_score``, ``log_prior``, ``log_likelihood``, ``posterior``,
``weak_4d_var``) re-expressed over flax modules and eps functions.
"""

import os
import sys
from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple

# Make the repo importable when running the CLIs from this directory.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from sda_tpu.diffusion import MCScoreNet, MCScoreWrapper, ScoreNet, ScoreUNet, bind_eps
from sda_tpu.dynamics import NoisyLorenz63
from sda_tpu.eval import bpf, weak_4d_var as _weak_4d_var
from sda_tpu.train import load_params
from sda_tpu.utils import ACTIVATIONS, enable_compilation_cache, load_config

enable_compilation_cache()

Array = jax.Array


if 'SCRATCH' in os.environ:
    PATH = Path(os.environ['SCRATCH']) / 'sda_tpu/lorenz'
else:
    PATH = Path(__file__).parent / 'storage'


def make_chain() -> NoisyLorenz63:
    return NoisyLorenz63(dt=0.025)


def make_global_score(
    embedding: int = 32,
    hidden_channels: Sequence[int] = (64,),
    hidden_blocks: Sequence[int] = (3,),
    activation: str = 'SiLU',
    **absorb,
) -> ScoreUNet:
    r"""The "global" baseline: a 1-D ScoreUNet over channels with time as
    space (reference ``experiments/lorenz/utils.py:26-42``). Train it with
    ``eps_wrapper=MCScoreWrapper`` so trajectories ``(B, L, C)`` are
    transposed around the network."""

    return ScoreUNet(
        channels=3,
        embedding=embedding,
        hidden_channels=tuple(hidden_channels),
        hidden_blocks=tuple(hidden_blocks),
        activation=ACTIVATIONS[activation],
        spatial=1,
    )


def make_local_score(
    window: int = 5,
    embedding: int = 32,
    width: int = 128,
    depth: int = 5,
    activation: str = 'SiLU',
    **absorb,
) -> ScoreNet:
    r"""The window kernel of the local score (reference
    ``experiments/lorenz/utils.py:45-59``); trained on flattened windows,
    composed with :class:`MCScoreNet` at inference."""

    return ScoreNet(
        features=3 * window,
        embedding=embedding,
        hidden_features=[width] * depth,
        activation=ACTIVATIONS[activation],
    )


def init_score(module, window: Optional[int] = None, key=None):
    r"""Initializes parameters with correctly-shaped dummy inputs."""

    if key is None:
        key = jax.random.key(0)

    if window is None:  # global: full trajectories (B, L, C) -> transpose
        x = jnp.zeros((1, 3, 32))  # channel-first for the 1-D UNet
    else:  # local: flattened windows
        x = jnp.zeros((1, 3 * window))

    return module.init(key, x, jnp.ones((1,)))['params']


def load_score(runpath: Path, local: bool = False, **kwargs):
    r"""Rebuilds a score module from ``config.json`` + ``state.msgpack``
    (reference ``experiments/lorenz/utils.py:62-79``).

    Returns ``(module, params, config)``.
    """

    runpath = Path(runpath)
    config = load_config(runpath)
    config.update(kwargs)

    if local:
        module = make_local_score(**config)
        params = init_score(module, window=config['window'])
    else:
        module = make_global_score(**config)
        params = init_score(module)

    params = load_params(params, runpath / 'state.msgpack')

    return module, params, config


def make_trajectory_eps(
    module,
    params,
    local: bool,
    window: int = 5,
) -> Callable:
    r"""Builds the full-trajectory eps function from a trained score:
    windowed composition for local kernels, time-as-space wrapping for the
    global baseline."""

    eps = bind_eps(module, params)

    if local:
        order = window // 2

        def kernel(x, t, c=None):
            # MCScoreNet windows carry (2k+1, C) frames merged into channels;
            # the MLP kernel was trained on flat (window * C) features.
            return eps(x, t, c)

        return MCScoreNet(kernel, order=order)
    else:
        return MCScoreWrapper(eps)


def log_prior(x: Array) -> Array:
    r"""Physics consistency: exact dynamics log-prob of a trajectory
    (reference ``experiments/lorenz/utils.py:82-88``)."""

    chain = make_chain()

    log_p = chain.log_prob(x[..., :-1, :], x[..., 1:, :])

    return jnp.sum(log_p, axis=-1)


def log_likelihood(
    y: Array,
    x: Array,
    A: Callable[[Array], Array] = lambda x: x,
    sigma: float = 1.0,
    step: int = 1,
) -> Array:
    r"""Gaussian observation log-density with temporal stride (reference
    ``experiments/lorenz/utils.py:91-103``)."""

    x = x[..., ::step, :]

    log_p = jax.scipy.stats.norm.logpdf(A(x), y, sigma)

    return jnp.sum(log_p, axis=(-1, -2))


def posterior(
    key: Array,
    y: Array,
    A: Callable[[Array], Array] = lambda x: x,
    sigma: float = 1.0,
    step: int = 1,
    particles: int = 16384,
) -> Array:
    r"""Ground-truth posterior via bootstrap particle filter (reference
    ``experiments/lorenz/utils.py:106-123``): prior ensemble, 64-step
    burn-in, BPF over the observations, aligned by dropping the first
    ``step`` frames."""

    chain = make_chain()
    k_prior, k_burn, k_bpf = jax.random.split(key, 3)

    x = chain.prior(k_prior, (particles,))
    x = chain.trajectory(k_burn, x, length=64, last=True)

    def log_w(yi, xi):
        return jnp.sum(
            jax.scipy.stats.norm.logpdf(A(xi), yi, sigma), axis=-1
        )

    hist = bpf(k_bpf, x, y, chain.transition, log_w, step)

    return hist[:, step:]


def weak_4d_var(
    x: Array,
    y: Array,
    A: Callable[[Array], Array] = lambda x: x,
    sigma: float = 1.0,
    step: int = 1,
    iterations: int = 320,
) -> Array:
    r"""Classical weak-constraint 4D-Var baseline (reference
    ``experiments/lorenz/utils.py:126-147``; 16 torch-LBFGS outer steps x 20
    inner iterations ~ 320 L-BFGS updates)."""

    return _weak_4d_var(
        x,
        y,
        log_prior=log_prior,
        log_likelihood=lambda y, x: log_likelihood(y, x, A, sigma, step),
        iterations=iterations,
    )
