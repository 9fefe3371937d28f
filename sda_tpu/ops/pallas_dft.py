r"""Pallas TPU kernel: fused two-stage real-pair 2-D DFT.

The matmul-DFT in :mod:`sda_tpu.ops.spectral` lowers to two chained basis
contractions (last axis, then axis -2). As separate XLA dots, the stage-1
intermediate ``(..., H, Fw)`` round-trips through HBM between them. This
kernel performs both stages per batch tile with the intermediate held in
VMEM, cutting the HBM traffic of the solver's hottest op (10+ transforms per
NS substep).

Forward (``pallas_rfft2``): real ``(N, H, W)`` -> pair ``(N, Kh, Fw)`` over
truncated mode sets (see ``RealDFT2``). Inverse (``pallas_irfft2``): pair ->
real. Both are linear maps; gradients are provided via ``jax.custom_vjp``
with the transposed contractions expressed as plain einsums (the VJP runs
outside the hot loop).

The kernels tile the batch axis; basis matrices are replicated into VMEM
once per tile. All matmuls request float32 accumulation explicitly.

**Status: PARKED (experimental), with data.** Measured on TPU v5e (256^2,
batch 8, full NS step): the fused kernel runs at ~0.8x the plain XLA einsum
path. Why, quantitatively: one 256^2 transform at batch 8 is ~120 MFLOP
(~2 us of MXU) against ~3 MB of HBM traffic (~4 us at v5e bandwidth) — a
microsecond, bandwidth-bound op. XLA already pipelines the two stage dots
and, crucially, fuses the surrounding elementwise spectral arithmetic into
them; a ``pallas_call`` is an optimization *barrier* that breaks exactly
that fusion, which costs more than the VMEM-resident intermediate saves.
A genuine win would require fusing an entire ``_nonlinear`` NS substep
(5 transforms + products) into one kernel — worthwhile only if the solver
(already 700x+ over the reference's budget, BENCH) ever becomes the
bottleneck. Until then ``RealDFT2(method='matmul')`` is the default and
this module is not counted as a performance feature.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    # Interpreter mode keeps the kernels testable on CPU.
    return jax.devices()[0].platform not in ('tpu',)


def _dot(a: Array, b: Array) -> Array:
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


# -- Forward -----------------------------------------------------------------


def _rfft2_kernel(x_ref, cw_ref, sw_ref, ch_ref, sh_ref, re_ref, im_ref):
    r"""One batch element: stage-1 contraction along W, stage-2 along H,
    intermediate kept in registers/VMEM."""

    x = x_ref[0]  # (H, W)

    # Stage 1: real DFT along W. (H, W) @ (W, Fw) -> (H, Fw)
    re1 = _dot(x, cw_ref[:].T)
    im1 = -_dot(x, sw_ref[:].T)

    # Stage 2: complex DFT along H. (Kh, H) @ (H, Fw) -> (Kh, Fw)
    ch = ch_ref[:]
    sh = sh_ref[:]

    re_ref[0] = _dot(ch, re1) + _dot(sh, im1)
    im_ref[0] = _dot(ch, im1) - _dot(sh, re1)


def _rfft2_raw(x: Array, cw: Array, sw: Array, ch: Array, sh: Array):
    n, h, w = x.shape
    kh, fw = ch.shape[0], cw.shape[0]

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fw, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fw, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kh, fw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, fw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    return pl.pallas_call(
        _rfft2_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, kh, fw), jnp.float32),
            jax.ShapeDtypeStruct((n, kh, fw), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, cw, sw, ch, sh)


# -- Inverse -----------------------------------------------------------------


def _irfft2_kernel(re_ref, im_ref, cw_ref, sw_ref, ch_ref, sh_ref, dw_ref, x_ref):
    re = re_ref[0]  # (Kh, Fw)
    im = im_ref[0]

    ch = ch_ref[:]
    sh = sh_ref[:]

    # Inverse along H (basis e^{+2 pi i a h / H}): (H, Kh) @ (Kh, Fw).
    re1 = _dot(ch.T, re) - _dot(sh.T, im)
    im1 = _dot(ch.T, im) + _dot(sh.T, re)

    # Inverse along W with Hermitian weights: (H, Fw) @ (Fw, W).
    dw = dw_ref[:]
    x_ref[0] = _dot(re1 * dw, cw_ref[:]) - _dot(im1 * dw, sw_ref[:])


def _irfft2_raw(re, im, cw, sw, ch, sh, dw, height, width):
    n, kh, fw = re.shape

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, kh, fw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, fw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fw, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fw, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, height), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, height), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, height, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        _irfft2_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, height, width), jnp.float32),
        interpret=_interpret(),
    )(re, im, cw, sw, ch, sh, dw)

    return out / (height * width)


# -- Differentiable wrappers ---------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=())
def _rfft2_op(x, cw, sw, ch, sh):
    return tuple(_rfft2_raw(x, cw, sw, ch, sh))


def _rfft2_fwd(x, cw, sw, ch, sh):
    return _rfft2_op(x, cw, sw, ch, sh), (cw, sw, ch, sh)


def _rfft2_bwd(res, g):
    cw, sw, ch, sh = res
    gre, gim = g

    # Transpose of the linear forward map (plain einsums; cold path).
    gre1 = jnp.einsum('naf,ah->nhf', gre, ch) - jnp.einsum('naf,ah->nhf', gim, sh)
    gim1 = jnp.einsum('naf,ah->nhf', gre, sh) + jnp.einsum('naf,ah->nhf', gim, ch)

    gx = jnp.einsum('nhf,fw->nhw', gre1, cw) - jnp.einsum('nhf,fw->nhw', gim1, sw)

    return gx, None, None, None, None


_rfft2_op.defvjp(_rfft2_fwd, _rfft2_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _irfft2_op(re, im, cw, sw, ch, sh, dw, height, width):
    return _irfft2_raw(re, im, cw, sw, ch, sh, dw, height, width)


def _irfft2_fwd(re, im, cw, sw, ch, sh, dw, height, width):
    out = _irfft2_op(re, im, cw, sw, ch, sh, dw, height, width)
    return out, (cw, sw, ch, sh, dw)


def _irfft2_bwd(height, width, res, gx):
    cw, sw, ch, sh, dw = res
    scale = 1.0 / (height * width)

    g1re = jnp.einsum('nhw,fw->nhf', gx, cw) * dw * scale
    g1im = -jnp.einsum('nhw,fw->nhf', gx, sw) * dw * scale

    gre = jnp.einsum('nhf,ah->naf', g1re, ch) + jnp.einsum('nhf,ah->naf', g1im, sh)
    gim = -jnp.einsum('nhf,ah->naf', g1re, sh) + jnp.einsum('nhf,ah->naf', g1im, ch)

    return gre, gim, None, None, None, None, None


_irfft2_op.defvjp(_irfft2_fwd, _irfft2_bwd)


# -- Public API ----------------------------------------------------------------


def pallas_rfft2(x: Array, dft) -> Tuple[Array, Array]:
    r"""Fused forward transform using a :class:`RealDFT2`'s basis matrices.

    ``x``: real ``(..., H, W)``; returns ``(re, im)`` of the truncated
    spectral shape. Leading batch axes are flattened around the kernel.
    """

    batch = x.shape[:-2]
    x = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)

    re, im = _rfft2_op(x, dft.cos_w, dft.sin_w, dft.cos_h, dft.sin_h)

    return (
        re.reshape(batch + re.shape[1:]),
        im.reshape(batch + im.shape[1:]),
    )


def pallas_irfft2(re: Array, im: Array, dft) -> Array:
    r"""Fused inverse transform using a :class:`RealDFT2`'s basis matrices."""

    batch = re.shape[:-2]
    re = re.reshape((-1,) + re.shape[-2:]).astype(jnp.float32)
    im = im.reshape((-1,) + im.shape[-2:]).astype(jnp.float32)

    out = _irfft2_op(
        re, im,
        dft.cos_w, dft.sin_w, dft.cos_h, dft.sin_h,
        dft.weight_w.reshape(1, -1),
        dft.height, dft.width,
    )

    return out.reshape(batch + out.shape[1:])
