r"""Kolmogorov experiment helpers: factories and visualization.

TPU-native counterpart of reference ``experiments/kolmogorov/utils.py``:
same factory surface over flax modules, and the same host-side visualization
utilities (icefire vorticity rendering, grid montages, sandwich plots, GIFs).
"""

import math
import os
import sys
from pathlib import Path
from typing import Callable, Optional, Sequence

# Make the repo importable when running the CLIs from this directory.
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

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
    module, params, window: int = 5, chunk: Optional[int] = None
) -> Callable:
    r"""Composes the trained window kernel into a full-trajectory eps
    function via the Markov-blanket decomposition. ``chunk`` enables the
    memory-optimal sequential window evaluation for long trajectories."""

    return MCScoreNet(bind_eps(module, params), order=window // 2, chunk=chunk)


# -- Visualization (host-side, parity with reference utils.py:84-200) -------


def vorticity2rgb(w, vmin: float = -1.25, vmax: float = 1.25) -> np.ndarray:
    r"""Signed-power icefire colormap of a vorticity field."""

    import seaborn

    w = np.asarray(w)
    w = (w - vmin) / (vmax - vmin)
    w = 2 * w - 1
    w = np.sign(w) * np.abs(w) ** 0.8
    w = (w + 1) / 2
    w = seaborn.cm.icefire(w)
    w = 256 * w[..., :3]

    return w.astype(np.uint8)


def draw(w, mask=None, pad: int = 4, zoom: int = 1, **kwargs):
    r"""Grid montage of vorticity fields with optional observation-mask
    overlay (unobserved pixels are greyed out). Pure-numpy compositing."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)
    w = w[(None,) * (5 - w.ndim)]
    rows, cols, h, width, _ = w.shape

    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        mask = np.broadcast_to(mask, (rows, cols, h, width))
        w = np.where(mask[..., None], w, np.uint8(240))

    canvas = np.full(
        (rows * (h + pad) + pad, cols * (width + pad) + pad, 3),
        255,
        dtype=np.uint8,
    )

    for i in range(rows):
        for j in range(cols):
            top = i * (h + pad) + pad
            left = j * (width + pad) + pad
            canvas[top : top + h, left : left + width] = w[i, j]

    if zoom > 1:
        canvas = np.repeat(np.repeat(canvas, zoom, axis=0), zoom, axis=1)

    return Image.fromarray(canvas)


def sandwich(w, offset: int = 5, border: int = 1, mirror: bool = False, **kwargs):
    r"""Diagonally-stacked rendering of a trajectory, later frames in front
    with a white border. Pure-numpy compositing."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)
    n, h, width, _ = w.shape

    if mirror:
        w = w[:, :, ::-1]

    canvas = np.full(
        (h + (n - 1) * offset, width + (n - 1) * offset, 3),
        255,
        dtype=np.uint8,
    )

    for i in range(n):
        top, left = i * offset, i * offset
        canvas[max(top - border, 0):, max(left - border, 0):] = 255
        canvas[top : top + h, left : left + width] = w[i]

    if mirror:
        canvas = canvas[:, ::-1]

    return Image.fromarray(canvas)


def save_gif(w, file: Path, dt: float = 0.2, **kwargs) -> None:
    r"""Animated GIF of a vorticity trajectory."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)

    imgs = [Image.fromarray(frame) for frame in w]
    imgs[0].save(
        file,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 * dt),
        loop=0,
    )
