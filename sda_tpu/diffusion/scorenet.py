r"""Score networks: MLP-based :class:`ScoreNet`, U-Net-based :class:`ScoreUNet`
and the forcing-conditioned :class:`LocalScoreUNet`.

TPU-native counterparts of reference ``sda/score.py:38-93`` and
``experiments/kolmogorov/utils.py:29-46``. Public call signatures keep the
reference's channel-first event layout ``(..., C, *spatial)`` so observation
operators and windowed composition stay layout-compatible; the convolutional
stack internally runs channels-last for TPU-friendly convolutions.

All are `flax.linen` modules; wrap ``module.apply`` into an eps function with
:func:`bind_eps`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import ResMLP, TimeEmbedding
from ..nn.unet import UNet
from ..utils import broadcast

Array = jax.Array


class ScoreNet(nn.Module):
    r"""MLP score network: ``eps(x, t, c) = ResMLP(concat(x, t_emb, c))``.

    Parity with reference ``sda/score.py:38-63``.

    Arguments:
        features: The number of features.
        embedding: The number of time-embedding features.
        hidden_features: The ResMLP hidden widths.
        activation: The activation function.
    """

    features: int
    embedding: int = 16
    hidden_features: Sequence[int] = (64, 64)
    activation: Callable[[Array], Array] = jax.nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        t = TimeEmbedding(self.embedding, dtype=self.dtype)(jnp.asarray(t))

        if c is None:
            x, t = broadcast(x, t, ignore=1)
            h = jnp.concatenate((x, t), axis=-1)
        else:
            x, t, c = broadcast(x, t, c, ignore=1)
            h = jnp.concatenate((x, t, c), axis=-1)

        out = ResMLP(
            out_features=self.features,
            hidden_features=self.hidden_features,
            activation=self.activation,
            dtype=self.dtype,
        )(h)

        return out.astype(x.dtype)


class ScoreUNet(nn.Module):
    r"""U-Net score network over channel-first fields.

    Parity with reference ``sda/score.py:66-93``: the context ``c`` is
    broadcast-concatenated along the channel axis, leading batch axes are
    flattened around the network call, and ``t`` may be a scalar (shared) or
    batched per leading element.

    Arguments:
        channels: The number of state channels.
        embedding: The number of time-embedding features.
        hidden_channels / hidden_blocks / kernel_size / stride / activation:
            U-Net hyper-parameters (see :class:`sda_tpu.nn.unet.UNet`).
        spatial: The number of spatial axes (1, 2 or 3).
        circular: Whether convolutions use periodic padding.
    """

    channels: int
    embedding: int = 64
    hidden_channels: Sequence[int] = (32, 64, 128)
    hidden_blocks: Sequence[int] = (2, 3, 5)
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 2
    activation: Callable[[Array], Array] = jax.nn.relu
    spatial: int = 2
    circular: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        dims = self.spatial + 1

        if c is None:
            y = x
        else:
            y, c = broadcast(x, c, ignore=dims)
            y = jnp.concatenate((y, c), axis=-dims)

        batch = x.shape[:-dims]

        # Flatten leading batch axes; broadcast t over them.
        y = y.reshape((-1,) + y.shape[-dims:])
        t = jnp.broadcast_to(jnp.asarray(t), batch).reshape(-1)
        t = TimeEmbedding(self.embedding, dtype=self.dtype)(t)

        # Channel-first -> channels-last for the TPU conv stack.
        y = jnp.moveaxis(y, 1, -1)

        y = UNet(
            out_channels=self.channels,
            hidden_channels=self.hidden_channels,
            hidden_blocks=self.hidden_blocks,
            kernel_size=self.kernel_size,
            stride=self.stride,
            activation=self.activation,
            spatial=self.spatial,
            circular=self.circular,
            dtype=self.dtype,
        )(y, t)

        y = jnp.moveaxis(y, -1, 1)

        return y.reshape(x.shape).astype(x.dtype)


class LocalScoreUNet(nn.Module):
    r"""Score U-Net conditioned on a fixed Kolmogorov-forcing channel.

    Parity with reference ``experiments/kolmogorov/utils.py:29-46``: the
    context is the constant field ``sin(4 b)`` (varying along the last spatial
    axis), overriding any ``c`` passed by the caller.

    Arguments:
        channels: The number of state channels.
        size: The spatial grid size.
        Remaining arguments as in :class:`ScoreUNet`.
    """

    channels: int
    size: int = 64
    embedding: int = 64
    hidden_channels: Sequence[int] = (32, 64, 128)
    hidden_blocks: Sequence[int] = (2, 3, 5)
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 2
    activation: Callable[[Array], Array] = jax.nn.relu
    circular: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        domain = 2 * math.pi / self.size * (jnp.arange(self.size) + 0.5)
        forcing = jnp.sin(4 * domain)
        forcing = jnp.broadcast_to(forcing, (1, self.size, self.size))

        return ScoreUNet(
            channels=self.channels,
            embedding=self.embedding,
            hidden_channels=self.hidden_channels,
            hidden_blocks=self.hidden_blocks,
            kernel_size=self.kernel_size,
            stride=self.stride,
            activation=self.activation,
            spatial=2,
            circular=self.circular,
            dtype=self.dtype,
        )(x, t, forcing)


def bind_eps(module: nn.Module, params: Any) -> Callable:
    r"""Wraps a flax score module and its parameters into an eps function
    ``eps(x, t, c=None)`` suitable for :class:`VPSDE` and friends."""

    def eps(x: Array, t: Array, c: Optional[Array] = None) -> Array:
        return module.apply({'params': params}, x, t, c)

    return eps
