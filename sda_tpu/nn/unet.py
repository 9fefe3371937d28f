r"""Modulated U-Net for 1-D/2-D/3-D fields.

TPU-native re-design of the reference U-Net (``sda/nn.py:74-206``):

- **channels-last layout** internally (``(N, *spatial, C)``) so convolutions
  map directly onto XLA's TPU-preferred layout (the reference is NCHW/torch);
- residual blocks modulated by a time-embedding vector:
  ``x + residue(x + project(t_emb))`` (reference ``sda/nn.py:18-28,131-142``);
- strided-conv downsampling, nearest-upsample + conv upsampling, additive
  skip connections (reference ``sda/nn.py:144-206``);
- non-affine LayerNorm over the channel axis;
- optional circular padding for periodic domains (Kolmogorov flow).

Callers that carry reference-style channel-first states should transpose at
the boundary (see ``sda_tpu.diffusion.scorenet.ScoreUNet``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import layer_norm

Array = jax.Array


class ModResidualBlock(nn.Module):
    r"""Residual block with additive vector modulation.

    ``x + residue(x + project(y))`` where ``project`` is a Dense layer
    broadcast over the spatial axes and ``residue`` is
    ``layer_norm -> conv -> activation -> conv``.
    """

    channels: int
    kernel_size: Sequence[int]
    activation: Callable[[Array], Array]
    padding: str
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        spatial = len(self.kernel_size)

        # Project the modulation vector and broadcast it over space.
        y = nn.Dense(self.channels, dtype=self.dtype)(y)
        y = y.reshape(y.shape[:-1] + (1,) * spatial + (self.channels,))

        h = x + y
        h = layer_norm(h, axis=-1)
        h = nn.Conv(self.channels, self.kernel_size, padding=self.padding, dtype=self.dtype)(h)
        h = self.activation(h)
        h = nn.Conv(self.channels, self.kernel_size, padding=self.padding, dtype=self.dtype)(h)

        return x + h


class UNet(nn.Module):
    r"""U-Net with modulation, channels-last.

    Arguments:
        out_channels: The number of output channels.
        hidden_channels: The number of channels at each depth.
        hidden_blocks: The number of modulated residual blocks at each depth.
        kernel_size: The convolution kernel size (int or per-axis sequence).
        stride: The down/upsampling factor (int or per-axis sequence).
        activation: The activation function.
        spatial: The number of spatial axes (1, 2 or 3).
        circular: Whether convolutions use circular (periodic) padding.
    """

    out_channels: int
    hidden_channels: Sequence[int] = (32, 64, 128)
    hidden_blocks: Sequence[int] = (2, 3, 5)
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 2
    activation: Callable[[Array], Array] = jax.nn.relu
    spatial: int = 2
    circular: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        r"""
        Arguments:
            x: Input field ``(N, *spatial, C_in)``.
            y: Modulation vector ``(N, F)`` or ``(F,)`` (broadcast).

        Returns:
            Output field ``(N, *spatial, out_channels)``.
        """

        kernel = self.kernel_size
        if isinstance(kernel, int):
            kernel = (kernel,) * self.spatial
        stride = self.stride
        if isinstance(stride, int):
            stride = (stride,) * self.spatial

        padding = 'CIRCULAR' if self.circular else 'SAME'
        depths = len(self.hidden_blocks)

        def block(h: Array, channels: int) -> Array:
            return ModResidualBlock(
                channels=channels,
                kernel_size=kernel,
                activation=self.activation,
                padding=padding,
                dtype=self.dtype,
            )(h, y)

        def upsample_nearest(h: Array) -> Array:
            for axis, r in enumerate(stride):
                h = jnp.repeat(h, r, axis=axis - self.spatial - 1)
            return h

        # Descent
        memory = []

        for i, blocks in enumerate(self.hidden_blocks):
            if i == 0:
                x = nn.Conv(
                    self.hidden_channels[i], kernel,
                    padding=padding, dtype=self.dtype,
                )(x)
            else:
                x = nn.Conv(
                    self.hidden_channels[i], kernel,
                    strides=stride, padding=padding, dtype=self.dtype,
                )(x)

            for _ in range(blocks):
                x = block(x, self.hidden_channels[i])

            memory.append(x)

        memory.pop()

        # Ascent
        for i in reversed(range(depths)):
            for _ in range(self.hidden_blocks[i]):
                x = block(x, self.hidden_channels[i])

            if i > 0:
                x = layer_norm(x, axis=-1)
                x = upsample_nearest(x)
                x = nn.Conv(
                    self.hidden_channels[i - 1], kernel,
                    padding=padding, dtype=self.dtype,
                )(x)
                x = x + memory.pop()
            else:
                x = nn.Conv(self.out_channels, kernel, padding=padding, dtype=self.dtype)(x)

        return x
