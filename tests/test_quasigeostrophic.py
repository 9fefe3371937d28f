r"""Tests for the two-layer quasi-geostrophic solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.dynamics import QuasiGeostrophic


def test_inversion_roundtrip():
    r"""q -> psi -> q must be the identity on the truncated modes."""

    chain = QuasiGeostrophic(size=32, dt=0.05)
    x = chain.prior(jax.random.key(0), (2,))

    q = chain.to_spectral(x)
    p = chain._invert(q)

    # Reapply the forward operator A = [[-k2-F, F], [F, -k2-F]].
    f = chain.kd2 / 2
    pr, pi = p

    def apply_a(a):
        a1, a2 = a[..., 0, :, :], a[..., 1, :, :]
        return jnp.stack(
            (
                (-chain.k2 - f) * a1 + f * a2,
                f * a1 + (-chain.k2 - f) * a2,
            ),
            axis=-3,
        )

    qr_back = apply_a(pr)
    qi_back = apply_a(pi)

    # k=0 modes (domain means) are in the inversion null space; compare the
    # rest.
    mask = np.asarray(chain.k2 > 0)
    np.testing.assert_allclose(
        np.asarray(qr_back)[..., mask], np.asarray(q[0])[..., mask],
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(qi_back)[..., mask], np.asarray(q[1])[..., mask],
        atol=1e-2,
    )


def test_barotropic_rossby_wave_dispersion():
    r"""With no shear/drag/coupling-asymmetry, a barotropic (equal-layer)
    single-mode wave propagates westward at the Rossby phase speed
    c = -beta / k^2 (zonal wavenumber k, no meridional structure)."""

    n, beta, kx = 64, 5.0, 2
    chain = QuasiGeostrophic(
        size=n, dt=0.05, beta=beta, shear=0.0, drag=0.0,
        deformation_wavenumber=4.0, hyperviscosity=0.0,
    )

    b = 2 * np.pi / n * np.arange(n)
    q0 = 0.1 * np.cos(kx * b)  # zonal wave, same in both layers
    x = jnp.asarray(
        np.broadcast_to(q0, (2, n, n)).copy(), jnp.float32
    )

    steps = 4
    y = x
    for _ in range(steps):
        y = chain.transition(None, y)

    # Expected phase shift after t = steps * dt: the barotropic mode obeys
    # d q / dt = -beta v with q = lap(psi): omega = -beta kx / k^2.
    t = steps * chain.dt
    omega = -beta * kx / kx**2
    expected = 0.1 * np.cos(kx * (b - omega / kx * t))

    got = np.asarray(y)[0]  # layer 1, any row
    np.testing.assert_allclose(got[0], expected, atol=5e-3)
    # Layers stay identical (barotropic mode preserved).
    np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y)[1], atol=5e-4)


def test_baroclinic_turbulence_is_bounded():
    r"""The forced-dissipative regime (shear injection vs drag + ssd) stays
    finite and O(initial) over a long horizon — baroclinic instability grows
    but saturates."""

    chain = QuasiGeostrophic(size=64, dt=0.1)
    x = chain.prior(jax.random.key(1), ())
    xs = chain.trajectory(jax.random.key(0), x, length=50)

    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))

    rms = np.sqrt((xs**2).mean(axis=(1, 2, 3)))
    assert rms[-1] < 100.0
    assert rms[-1] > 0.01


def test_trajectory_shapes_and_batching():
    chain = QuasiGeostrophic(size=32, dt=0.05)
    x = chain.prior(jax.random.key(2), (3,))
    assert x.shape == (3, 2, 32, 32)

    xs = chain.trajectory(jax.random.key(0), x, length=4)
    assert xs.shape == (4, 3, 2, 32, 32)

    last = chain.trajectory(jax.random.key(0), x, length=4, last=True)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(last), atol=1e-4)


def test_streamfunction_shapes():
    chain = QuasiGeostrophic(size=32, dt=0.05)
    x = chain.prior(jax.random.key(3), (2,))

    psi = chain.streamfunction(x)
    assert psi.shape == x.shape
    assert np.all(np.isfinite(np.asarray(psi)))


def test_qg_transition_is_jittable():
    chain = QuasiGeostrophic(size=32, dt=0.05)
    x = chain.prior(jax.random.key(4), ())

    y = jax.jit(lambda x: chain.transition(None, x))(x)
    assert y.shape == (2, 32, 32)
    assert np.all(np.isfinite(np.asarray(y)))
