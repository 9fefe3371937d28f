r"""Neural-network primitives: non-affine LayerNorm, time embedding, ResMLP.

TPU-native counterparts of the reference primitives:

- :func:`layer_norm` replaces ``zuko.nn.LayerNorm`` (non-learnable
  standardization, imported at reference ``sda/nn.py:8``).
- :class:`TimeEmbedding` mirrors reference ``sda/score.py:15-35``.
- :class:`ResMLP` mirrors reference ``sda/nn.py:31-71``.

All modules are `flax.linen` modules over pytree parameters — pure functions
under `jax.jit`, vmappable and shardable with `pjit`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def layer_norm(x: Array, axis: int = -1, eps: float = 1e-5) -> Array:
    r"""Standardizes ``x`` along ``axis`` with **no** learnable affine terms.

    Equivalent to ``zuko.nn.LayerNorm`` (zuko 0.1.4) used by the reference at
    ``sda/nn.py:61,137,163``: ``(x - mean) / sqrt(var + eps)``. Statistics
    are computed in float32 regardless of the input dtype (bf16-safe).
    """

    dtype = x.dtype
    x32 = x.astype(jnp.float32)

    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.var(x32, axis=axis, keepdims=True)

    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class TimeEmbedding(nn.Module):
    r"""Sinusoidal time embedding followed by a 2-layer MLP.

    ``t -> [cos(pi k t), sin(pi k t)]_{k=1..16} -> Dense(256) -> SiLU ->
    Dense(features)``. Parity with reference ``sda/score.py:15-35``.

    Arguments:
        features: The number of output embedding features.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, t: Array) -> Array:
        # Frequencies in float32: bf16 cos/sin of pi*k*t loses phase accuracy.
        freqs = math.pi * jnp.arange(1, 17, dtype=jnp.float32)

        t = freqs * t[..., None].astype(jnp.float32)
        t = jnp.concatenate((jnp.cos(t), jnp.sin(t)), axis=-1)

        t = nn.Dense(256, dtype=self.dtype)(t)
        t = jax.nn.silu(t)
        t = nn.Dense(self.features, dtype=self.dtype)(t)

        return t


class ResMLP(nn.Module):
    r"""Residual multi-layer perceptron.

    For each transition ``before -> after`` along ``(in, *hidden, out)``: an
    optional width-changing Dense, then a residual block
    ``x + Dense(act(Dense(layer_norm(x))))``. Parity with reference
    ``sda/nn.py:31-71`` (whose blocks are ``LayerNorm -> Linear -> act ->
    Linear`` with a residual skip).

    Arguments:
        out_features: The number of output features.
        hidden_features: The hidden widths.
        activation: The activation function.
    """

    out_features: int
    hidden_features: Sequence[int] = (64, 64)
    activation: Callable[[Array], Array] = jax.nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        widths = (*self.hidden_features, self.out_features)
        before = x.shape[-1]

        for after in widths:
            if after != before:
                x = nn.Dense(after, dtype=self.dtype)(x)

            h = layer_norm(x)
            h = nn.Dense(after, dtype=self.dtype)(h)
            h = self.activation(h)
            h = nn.Dense(after, dtype=self.dtype)(h)
            x = x + h

            before = after

        return x
