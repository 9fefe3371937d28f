r"""Kolmogorov experiment helpers: factories and visualization.

TPU-native counterpart of reference ``experiments/kolmogorov/utils.py``:
same factory surface over flax modules, and the same host-side visualization
utilities (icefire vorticity rendering, grid montages, sandwich plots, GIFs).
"""

import os
import sys
from pathlib import Path
from typing import Callable, Optional, Sequence

# Make the repo importable when running the CLIs from this directory.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from sda_tpu.diffusion import LocalScoreUNet, MCScoreNet, bind_eps
from sda_tpu.dynamics import KolmogorovFlow
from sda_tpu.train import load_params
from sda_tpu.utils import ACTIVATIONS, enable_compilation_cache, load_config

enable_compilation_cache()

Array = jax.Array


if 'SCRATCH' in os.environ:
    PATH = Path(os.environ['SCRATCH']) / 'sda_tpu/kolmogorov'
else:
    PATH = Path(__file__).parent / 'storage'


def make_chain(size: int = 256) -> KolmogorovFlow:
    return KolmogorovFlow(size=size, dt=0.2)


def make_score(
    window: int = 5,
    embedding: int = 64,
    hidden_channels: Sequence[int] = (64, 128, 256),
    hidden_blocks: Sequence[int] = (3, 3, 3),
    kernel_size: int = 3,
    activation: str = 'SiLU',
    size: int = 64,
    bf16: bool = False,
    **absorb,
) -> LocalScoreUNet:
    r"""The forcing-conditioned window kernel (reference
    ``experiments/kolmogorov/utils.py:49-70``): a circular-padded ScoreUNet
    over ``window * 2`` channels with the fixed ``sin(4 b)`` context."""

    return LocalScoreUNet(
        channels=window * 2,
        size=size,
        embedding=embedding,
        hidden_channels=tuple(hidden_channels),
        hidden_blocks=tuple(hidden_blocks),
        kernel_size=kernel_size,
        activation=ACTIVATIONS[activation],
        circular=True,
        dtype=jnp.bfloat16 if bf16 else None,
    )


def init_score(module: LocalScoreUNet, key=None):
    if key is None:
        key = jax.random.key(0)

    x = jnp.zeros((1, module.channels, module.size, module.size))

    return module.init(key, x, jnp.ones((1,)))['params']


def load_score(runpath: Path, **kwargs):
    r"""Rebuilds the score from ``config.json`` + ``state.msgpack``."""

    runpath = Path(runpath)
    config = load_config(runpath)
    config.update(kwargs)

    module = make_score(**config)
    params = init_score(module)
    params = load_params(params, runpath / 'state.msgpack')

    return module, params, config


def make_trajectory_eps(
    module, params, window: int = 5, chunk: Optional[int] = None, mesh=None,
    remat: bool = False,
) -> Callable:
    r"""Composes the trained window kernel into a full-trajectory eps
    function via the Markov-blanket decomposition. ``chunk`` enables the
    memory-optimal sequential window evaluation for long trajectories;
    ``mesh`` (with an ``'sp'`` axis) shards the trajectory axis over devices
    with halo exchange (sequence/context parallelism). The two levers
    compose: with both a mesh and a chunk, each sequence shard evaluates its
    windows in chunks of ``chunk`` (per-chunk remat included), the
    configuration for 256^2 long trajectories that exceed one chip's HBM
    even after sharding."""

    if mesh is not None and 'sp' in mesh.axis_names and mesh.shape['sp'] > 1:
        from sda_tpu.parallel import ShardedMCScoreNet

        return ShardedMCScoreNet(
            bind_eps(module, params), order=window // 2, mesh=mesh,
            chunk=chunk, remat=remat,
        )

    return MCScoreNet(
        bind_eps(module, params), order=window // 2, chunk=chunk, remat=remat
    )


# -- Visualization (host-side, parity with reference utils.py:84-200) -------
# Shared with the QG pack; implementations live in sda_tpu.viz.

from sda_tpu.viz import draw, sandwich, save_gif, vorticity2rgb  # noqa: E402,F401
