r"""Tests for the fused Pallas DFT kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.ops import RealDFT2
from sda_tpu.ops.pallas_dft import pallas_irfft2, pallas_rfft2


@pytest.fixture
def dfts():
    n, m = 32, 11
    mat = RealDFT2(n, n, method='matmul', h_modes=m, w_modes=m)
    pal = RealDFT2(n, n, method='pallas', h_modes=m, w_modes=m)
    return mat, pal


def test_pallas_rfft2_matches_matmul(dfts):
    mat, pal = dfts
    x = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32), jnp.float32)

    r1, i1 = mat.rfft2(x)
    r2, i2 = pal.rfft2(x)

    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-3)


def test_pallas_irfft2_matches_matmul(dfts):
    mat, pal = dfts
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32), jnp.float32)

    re, im = mat.rfft2(x)

    y1 = mat.irfft2(re, im)
    y2 = pal.irfft2(re, im)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_pallas_roundtrip_with_extra_batch_axes(dfts):
    _, pal = dfts
    x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 32, 32), jnp.float32)

    re, im = pal.rfft2(x)
    assert re.shape == (2, 3, 21, 11)

    y = pal.irfft2(re, im)
    # Truncation loses high modes; compare against the matmul path instead
    # of the input.
    mat = RealDFT2(32, 32, method='matmul', h_modes=11, w_modes=11)
    want = mat.irfft2(*mat.rfft2(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4)


def test_pallas_dft_gradients_match_matmul(dfts):
    mat, pal = dfts
    x = jnp.asarray(np.random.RandomState(3).randn(1, 32, 32), jnp.float32)

    def loss(dft, x):
        re, im = dft.rfft2(x)
        y = dft.irfft2(re * 0.5 + 1.0, im * 2.0)
        return jnp.sum(y**2) + jnp.sum(re * im)

    g1 = jax.grad(lambda x: loss(mat, x))(x)
    g2 = jax.grad(lambda x: loss(pal, x))(x)

    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-2)


def test_solver_runs_with_pallas_dft():
    from sda_tpu.dynamics import KolmogorovFlow

    ref = KolmogorovFlow(size=32, dt=0.05, dft_method='matmul')
    pal = KolmogorovFlow(size=32, dt=0.05, dft_method='pallas')

    x = ref.prior(jax.random.key(0), ())

    y_ref = np.asarray(ref.transition(None, x))
    y_pal = np.asarray(pal.transition(None, x))

    np.testing.assert_allclose(y_ref, y_pal, atol=5e-3)
