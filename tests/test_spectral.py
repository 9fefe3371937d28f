r"""Tests for the real-pair DFT engines (matmul-DFT vs numpy/XLA FFT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.ops import RealDFT2
from sda_tpu.dynamics import KolmogorovFlow


@pytest.mark.parametrize('n', [8, 32, 64])
def test_matmul_rfft2_matches_numpy(n):
    dft = RealDFT2(n, n, method='matmul')
    x = np.random.RandomState(0).randn(3, n, n).astype(np.float32)

    re, im = dft.rfft2(jnp.asarray(x))
    want = np.fft.rfft2(x)

    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-3 * n)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-3 * n)


@pytest.mark.parametrize('n', [8, 32, 64])
def test_matmul_irfft2_roundtrip(n):
    dft = RealDFT2(n, n, method='matmul')
    x = np.random.RandomState(1).randn(2, n, n).astype(np.float32)

    y = dft.irfft2(*dft.rfft2(jnp.asarray(x)))

    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4 * n)


def test_fft_backend_matches_matmul():
    n = 32
    mat = RealDFT2(n, n, method='matmul')
    fft = RealDFT2(n, n, method='fft')

    x = jnp.asarray(np.random.RandomState(2).randn(n, n), jnp.float32)

    r1, i1 = mat.rfft2(x)
    r2, i2 = fft.rfft2(x)

    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-2)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-2)


def test_matmul_dft_is_differentiable():
    dft = RealDFT2(16, 16, method='matmul')

    def f(x):
        re, im = dft.rfft2(x)
        return jnp.sum(re**2 + im**2)

    x = jnp.asarray(np.random.RandomState(3).randn(16, 16), jnp.float32)
    g = jax.grad(f)(x)

    # Parseval: sum |X|^2 over the full spectrum = N^2 sum x^2, so with the
    # Hermitian half-spectrum the gradient is ~2 N^2 x up to edge columns.
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_solver_matmul_vs_fft_backend():
    r"""The NS solver must produce identical trajectories under both DFT
    backends (same math, different transform implementation)."""

    x0 = None
    outs = {}

    for method in ('fft', 'matmul'):
        chain = KolmogorovFlow(size=32, dt=0.05, dft_method=method)
        if x0 is None:
            x0 = chain.prior(jax.random.key(0), ())
        outs[method] = np.asarray(chain.transition(None, x0))

    np.testing.assert_allclose(outs['fft'], outs['matmul'], atol=5e-3)
