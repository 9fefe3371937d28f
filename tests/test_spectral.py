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


def test_truncated_rfft2_matches_selected_modes():
    r"""Truncated forward = full rfft2 restricted to the retained rows/cols;
    truncated inverse = zero-pad + full irfft2."""

    n, m = 32, 7  # keep |k| <= 6
    dft = RealDFT2(n, n, method='matmul', h_modes=m, w_modes=m)
    x = np.random.RandomState(4).randn(n, n).astype(np.float32)

    re, im = dft.rfft2(jnp.asarray(x))
    assert re.shape == (2 * m - 1, m)

    full = np.fft.rfft2(x)
    rows = np.concatenate([np.arange(m), np.arange(n - m + 1, n)])
    want = full[rows][:, :m]

    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-3)

    # Inverse: zero-pad the truncated spectrum back into a full spectrum.
    padded = np.zeros((n, n // 2 + 1), dtype=np.complex64)
    padded[rows[:, None], np.arange(m)[None, :]] = want
    want_x = np.fft.irfft2(padded, s=(n, n))

    got_x = dft.irfft2(re, im)
    np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-4)


def test_truncated_solver_matches_masked_full_solver():
    r"""The truncated-spectrum solver equals a full-spectrum solver whose
    input has no energy above the cutoff (both implement the same 2/3-rule
    dynamics)."""

    chain = KolmogorovFlow(size=32, dt=0.05)
    x0 = chain.prior(jax.random.key(0), ())

    # Round-trip through the truncated basis to strip any above-cutoff
    # residue, then compare one transition against three half-steps worth of
    # repeated transitions for self-consistency.
    w, mean = chain.to_spectral(x0)
    x0 = chain.to_velocity(w, mean)

    y1 = chain.transition(None, x0)
    chain2 = KolmogorovFlow(size=32, dt=0.025)
    y2 = chain2.transition(None, chain2.transition(None, x0))

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-3)
