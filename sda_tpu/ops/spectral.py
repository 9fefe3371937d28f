r"""Real-valued 2-D DFT engines: MXU matmul-DFT and XLA FFT backends.

The pseudo-spectral Navier-Stokes solver needs forward/inverse real 2-D
Fourier transforms. On TPU the idiomatic implementation is **DFT as matrix
multiplication on the MXU**: for the solver's grid sizes (64-1024) the DFT
basis matmul is a few MXU passes — competitive with (and on some platforms
faster than) the FFT custom call — and it avoids complex dtypes entirely,
which some TPU runtimes do not implement. Everything here operates on
``(re, im)`` pairs of real arrays; gradients flow through plain einsums.

Basis convention matches ``numpy.fft.rfft2``: forward uses
:math:`e^{-2\pi i k n / N}` with no normalization; inverse scales by
:math:`1/N` per axis.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def default_dft_method() -> str:
    r"""Picks the DFT backend: matmul on TPU-like platforms (MXU-friendly,
    no complex dtype), XLA FFT elsewhere (CPU/GPU)."""

    platform = jax.devices()[0].platform

    return 'fft' if platform in ('cpu', 'gpu', 'cuda', 'rocm') else 'matmul'


class RealDFT2:
    r"""Forward/inverse real 2-D DFT over the last two axes, with optional
    **mode truncation**.

    Arguments:
        height, width: The grid size.
        method: ``'matmul'`` (MXU basis matmuls, no complex dtype),
            ``'fft'`` (XLA FFT custom call), or ``'auto'``.
        h_modes: Retained non-negative frequencies along axis -2 (``None`` =
            all). The kept spectrum rows are frequencies ``0..h_modes-1`` and
            ``-(h_modes-1)..-1`` (``2*h_modes - 1`` rows total).
        w_modes: Retained frequencies along the real (last) axis (``None`` =
            the full half spectrum ``W//2 + 1``).

    Untruncated, ``rfft2`` maps real ``(..., H, W)`` to a pair ``(re, im)``
    of shape ``(..., H, W//2 + 1)`` matching ``numpy.fft.rfft2``; truncated,
    the spectral shape is ``(..., 2*h_modes - 1, w_modes)`` and the inverse
    treats dropped modes as zero. For a pseudo-spectral solver, choosing the
    2/3-rule cutoffs makes dealiasing exact *by construction* while cutting
    every basis matmul's FLOPs roughly in half.
    """

    def __init__(
        self,
        height: int,
        width: int,
        method: str = 'auto',
        h_modes: int = None,
        w_modes: int = None,
    ):
        self.height = height
        self.width = width
        self.method = default_dft_method() if method == 'auto' else method

        full_h = h_modes is None
        full_w = w_modes is None

        if h_modes is None:
            # All rows, in standard FFT order.
            freqs_h = np.fft.fftfreq(height, d=1.0 / height)
        else:
            freqs_h = np.concatenate(
                [np.arange(0, h_modes), np.arange(-(h_modes - 1), 0)]
            )

        if w_modes is None:
            w_modes = width // 2 + 1
        freqs_w = np.arange(w_modes)

        self.freqs_h = jnp.asarray(freqs_h, jnp.float32)
        self.freqs_w = jnp.asarray(freqs_w, jnp.float32)
        self.spectral_shape = (len(freqs_h), w_modes)

        # The FFT backend only supports the untruncated layout.
        if self.method == 'fft' and not (full_h and full_w):
            self.method = 'matmul'

        if self.method in ('matmul', 'pallas'):
            # Forward bases (numpy convention e^{-2 pi i k n / N}).
            fw = freqs_w[:, None] * np.arange(width)[None, :]
            self.cos_w = jnp.asarray(np.cos(2 * np.pi * fw / width), jnp.float32)
            self.sin_w = jnp.asarray(np.sin(2 * np.pi * fw / width), jnp.float32)

            ah = freqs_h[:, None] * np.arange(height)[None, :]
            self.cos_h = jnp.asarray(np.cos(2 * np.pi * ah / height), jnp.float32)
            self.sin_h = jnp.asarray(np.sin(2 * np.pi * ah / height), jnp.float32)

            # Hermitian weights for the inverse along the half axis: interior
            # columns count twice (their conjugates are implicit).
            dw = np.full(w_modes, 2.0)
            dw[0] = 1.0
            if full_w and width % 2 == 0:
                dw[-1] = 1.0
            self.weight_w = jnp.asarray(dw, jnp.float32)

    # -- Forward -------------------------------------------------------------

    def rfft2(self, x: Array) -> Tuple[Array, Array]:
        if self.method == 'fft':
            out = jnp.fft.rfft2(x)
            return jnp.real(out), jnp.imag(out)

        if self.method == 'pallas':
            from .pallas_dft import pallas_rfft2

            return pallas_rfft2(x, self)

        hp = jax.lax.Precision.HIGHEST

        # Real DFT along the last axis (half spectrum).
        re = jnp.einsum('...hw,fw->...hf', x, self.cos_w, precision=hp)
        im = -jnp.einsum('...hw,fw->...hf', x, self.sin_w, precision=hp)

        # Full complex DFT along axis -2, in (re, im) pair form.
        re2 = (
            jnp.einsum('...hf,ah->...af', re, self.cos_h, precision=hp)
            + jnp.einsum('...hf,ah->...af', im, self.sin_h, precision=hp)
        )
        im2 = (
            jnp.einsum('...hf,ah->...af', im, self.cos_h, precision=hp)
            - jnp.einsum('...hf,ah->...af', re, self.sin_h, precision=hp)
        )

        return re2, im2

    # -- Inverse -------------------------------------------------------------

    def irfft2(self, re: Array, im: Array) -> Array:
        if self.method == 'fft':
            return jnp.fft.irfft2(
                jax.lax.complex(re, im), s=(self.height, self.width)
            )

        if self.method == 'pallas':
            from .pallas_dft import pallas_irfft2

            return pallas_irfft2(re, im, self)

        hp = jax.lax.Precision.HIGHEST

        # Inverse complex DFT along axis -2 (basis e^{+2 pi i a h / H} / H).
        re1 = (
            jnp.einsum('...af,ah->...hf', re, self.cos_h, precision=hp)
            - jnp.einsum('...af,ah->...hf', im, self.sin_h, precision=hp)
        ) / self.height
        im1 = (
            jnp.einsum('...af,ah->...hf', im, self.cos_h, precision=hp)
            + jnp.einsum('...af,ah->...hf', re, self.sin_h, precision=hp)
        ) / self.height

        # Inverse real DFT along the last axis with Hermitian weighting.
        x = (
            jnp.einsum('...hf,fw->...hw', re1 * self.weight_w, self.cos_w, precision=hp)
            - jnp.einsum('...hf,fw->...hw', im1 * self.weight_w, self.sin_w, precision=hp)
        ) / self.width

        return x
