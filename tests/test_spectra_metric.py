r"""Tests for the spectral fidelity metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.dynamics import KolmogorovFlow
from sda_tpu.eval import energy_spectrum, spectrum_distance


def test_energy_spectrum_parseval():
    r"""Shell-summed spectrum integrates to the total kinetic energy."""

    chain = KolmogorovFlow(size=64, dt=0.2)
    x = chain.prior(jax.random.key(0), (4,))

    centers, spec = energy_spectrum(x)
    total_spectral = spec.sum()
    total_physical = float(0.5 * jnp.mean(jnp.sum(x**2, axis=1)))

    # The k=0 shell (mean flow, ~0 here) is outside the bins; tolerance
    # covers binning of the k<0.5 modes.
    np.testing.assert_allclose(total_spectral, total_physical, rtol=0.05)


def test_energy_spectrum_peak_location():
    r"""A single-wavenumber flow has all its energy in that shell."""

    n, k0 = 64, 4
    b = 2 * np.pi / n * np.arange(n)
    u = np.tile(np.sin(k0 * b), (n, 1))
    x = jnp.asarray(np.stack([u, np.zeros_like(u)])[None], jnp.float32)

    centers, spec = energy_spectrum(x)

    assert centers[np.argmax(spec)] == k0
    assert spec[np.argmax(spec)] > 0.99 * spec.sum()


def test_spectrum_distance_self_is_small():
    chain = KolmogorovFlow(size=64, dt=0.2)
    x = chain.prior(jax.random.key(1), (8,))
    y = chain.prior(jax.random.key(2), (8,))

    same = spectrum_distance(x, y)
    assert same < 0.2

    # A field with a very different spectrum is far.
    z = jax.random.normal(jax.random.key(3), x.shape)
    far = spectrum_distance(x, z)
    assert far > 5 * same
