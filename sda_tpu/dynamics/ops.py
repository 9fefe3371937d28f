r"""Differentiable grid operators: coarsening, upsampling, vorticity.

TPU-native re-design of reference ``sda/mcs.py:340-375``. These are the
building blocks of observation operators :math:`A(x)`, so they must be
jit- and grad-compatible — they appear *inside* ``jax.grad`` during guided
sampling. All operate on channel-first fields ``(..., H, W)`` on periodic
domains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def coarsen(x: Array, r: int = 2) -> Array:
    r"""Mean-pool coarsening by a factor ``r`` over the last two axes.

    Parity with reference ``sda/mcs.py:340-347``.
    """

    *batch, h, w = x.shape

    x = x.reshape(*batch, h // r, r, w // r, r)

    return x.mean(axis=(-3, -1))


def upsample(x: Array, r: int = 2, mode: str = 'bilinear') -> Array:
    r"""Periodic upsampling by a factor ``r`` over the last two axes.

    Parity with reference ``sda/mcs.py:349-359``: circular-pad by one cell,
    interpolate with scale ``r`` (half-pixel-centered for ``'bilinear'``,
    floor-indexed for ``'nearest'``), then crop the padding back off.
    """

    *batch, h, w = x.shape
    x = x.reshape(-1, h, w)

    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode='wrap')

    if mode == 'nearest':
        x = jnp.repeat(jnp.repeat(x, r, axis=-2), r, axis=-1)
    elif mode == 'bilinear':
        n, hp, wp = x.shape
        x = jax.image.resize(x, (n, r * hp, r * wp), method='bilinear')
    else:
        raise ValueError(f"unknown upsampling mode '{mode}'")

    x = x[..., r:-r, r:-r]

    return x.reshape(*batch, r * h, r * w)


def vorticity(x: Array) -> Array:
    r"""Central-difference vorticity of a velocity field ``(..., 2, H, W)``.

    Parity with reference ``sda/mcs.py:361-375``:
    ``du/d(axis -1) - dv/d(axis -2)`` with unit grid spacing and circular
    boundary handling (the reference pads circularly, applies
    ``torch.gradient``, and crops — on the interior that is exactly the
    roll-based central difference used here).
    """

    u = x[..., 0, :, :]
    v = x[..., 1, :, :]

    du = (jnp.roll(u, -1, axis=-1) - jnp.roll(u, 1, axis=-1)) / 2
    dv = (jnp.roll(v, -1, axis=-2) - jnp.roll(v, 1, axis=-2)) / 2

    return du - dv
