r"""Quasi-geostrophic experiment helpers: factories and visualization.

The reference's qg branch attaches SDA to a two-layer quasi-geostrophic
system (BASELINE.json config 5: "multi-field assimilation at scale"); this
pack mirrors the Kolmogorov pack's surface (``make_chain``, ``make_score``,
``load_score``, ``make_trajectory_eps``) over the spectral QG solver
(:class:`sda_tpu.dynamics.QuasiGeostrophic`). States are 2-layer potential
vorticity fields ``(L, 2, H, W)`` — the two channels are physically distinct
coupled layers, not velocity components.
"""

import os
import sys
from pathlib import Path
from typing import Callable, Optional, Sequence

# Make the repo importable when running the CLIs from this directory.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from sda_tpu.diffusion import MCScoreNet, ScoreUNet, bind_eps
from sda_tpu.dynamics import QuasiGeostrophic
from sda_tpu.train import load_params
from sda_tpu.utils import ACTIVATIONS, enable_compilation_cache, load_config
from sda_tpu.viz import draw, sandwich, save_gif, vorticity2rgb  # noqa: F401

enable_compilation_cache()

Array = jax.Array


if 'SCRATCH' in os.environ:
    PATH = Path(os.environ['SCRATCH']) / 'sda_tpu/qg'
else:
    PATH = Path(__file__).parent / 'storage'


def make_chain(size: int = 128) -> QuasiGeostrophic:
    return QuasiGeostrophic(size=size, dt=0.1)


def make_score(
    window: int = 5,
    embedding: int = 64,
    hidden_channels: Sequence[int] = (96, 192, 384),
    hidden_blocks: Sequence[int] = (3, 3, 3),
    kernel_size: int = 3,
    activation: str = 'SiLU',
    size: int = 64,
    bf16: bool = False,
    **absorb,
) -> ScoreUNet:
    r"""The QG window kernel: a circular-padded ScoreUNet over
    ``window * 2`` channels (two PV layers per frame). Unlike Kolmogorov's
    :class:`LocalScoreUNet` there is no fixed forcing field to condition on —
    the beta-plane background is homogeneous in space."""

    return ScoreUNet(
        channels=window * 2,
        embedding=embedding,
        hidden_channels=tuple(hidden_channels),
        hidden_blocks=tuple(hidden_blocks),
        kernel_size=kernel_size,
        activation=ACTIVATIONS[activation],
        spatial=2,
        circular=True,
        dtype=jnp.bfloat16 if bf16 else None,
    )


def init_score(module: ScoreUNet, size: int = 64, key=None):
    if key is None:
        key = jax.random.key(0)

    x = jnp.zeros((1, module.channels, size, size))

    return module.init(key, x, jnp.ones((1,)))['params']


def load_score(runpath: Path, **kwargs):
    r"""Rebuilds the score from ``config.json`` + ``state.msgpack``."""

    runpath = Path(runpath)
    config = load_config(runpath)
    config.update(kwargs)

    module = make_score(**config)
    params = init_score(module, size=config.get('size', 64))
    params = load_params(params, runpath / 'state.msgpack')

    return module, params, config


def make_trajectory_eps(
    module, params, window: int = 5, chunk: Optional[int] = None, mesh=None
) -> Callable:
    r"""Composes the trained window kernel into a full-trajectory eps
    function (Markov-blanket decomposition; sequence-parallel over an
    ``'sp'`` mesh axis when given)."""

    if mesh is not None and 'sp' in mesh.axis_names and mesh.shape['sp'] > 1:
        from sda_tpu.parallel import ShardedMCScoreNet

        return ShardedMCScoreNet(
            bind_eps(module, params), order=window // 2, mesh=mesh
        )

    return MCScoreNet(bind_eps(module, params), order=window // 2, chunk=chunk)
