r"""Tests for the pseudo-spectral Navier-Stokes solver.

Validation strategy (SURVEY.md §4/§7): analytic Taylor-Green decay, exact
divergence-freeness, spectral round trips, and statistical sanity of the
forced turbulent regime at small size.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.dynamics import KolmogorovFlow


def make_grid(n):
    a = 2 * np.pi / n * (np.arange(n) + 0.5)
    return np.meshgrid(a, a, indexing='ij')


def test_taylor_green_decay():
    r"""Unforced, undragged NS has the exact Taylor-Green solution
    u(t) = u0 exp(-2 nu t): the advection term vanishes identically."""

    n, re, dt = 64, 100.0, 0.1
    chain = KolmogorovFlow(
        size=n, dt=dt, reynolds=re, forcing_magnitude=0.0, drag=0.0
    )

    A, B = make_grid(n)
    u = np.sin(A) * np.cos(B)
    v = -np.cos(A) * np.sin(B)
    x = jnp.asarray(np.stack([u, v])[None])

    steps = 5
    for _ in range(steps):
        x = chain.transition(None, x)

    decay = math.exp(-2 * (1 / re) * dt * steps)
    np.testing.assert_allclose(
        np.asarray(x)[0], np.stack([u, v]) * decay, atol=2e-4
    )


def test_spectral_roundtrip():
    chain = KolmogorovFlow(size=32, dt=0.1)
    x = chain.prior(jax.random.key(0), (2,))

    w_hat, mean = chain.to_spectral(x)
    y = chain.to_velocity(w_hat, mean)

    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_prior_divergence_free():
    n = 64
    chain = KolmogorovFlow(size=n, dt=0.1)
    x = chain.prior(jax.random.key(1), (3,))

    ur, ui = chain.dft.rfft2(x[:, 0])
    vr, vi = chain.dft.rfft2(x[:, 1])
    div = jnp.abs(chain.ka * ur + chain.kb * vr) + jnp.abs(
        chain.ka * ui + chain.kb * vi
    )

    scale = float(jnp.max(jnp.abs(ur) + jnp.abs(ui)))
    assert float(jnp.max(div)) < 1e-3 * scale


def test_prior_max_speed_and_spectrum():
    n = 64
    chain = KolmogorovFlow(size=n, dt=0.1)
    x = chain.prior(jax.random.key(2), (4,))

    speed = np.sqrt(np.sum(np.asarray(x) ** 2, axis=1))
    np.testing.assert_allclose(speed.max(axis=(-2, -1)), 3.0, atol=1e-3)

    # Energy concentrated at low-ish wavenumbers (peak near 4, nothing at
    # the grid scale).
    ur, ui = chain.dft.rfft2(x[:, 0])
    energy = np.asarray(ur**2 + ui**2)
    k = np.asarray(jnp.sqrt(chain.k2))
    low = energy[:, k < 8].sum()
    high = energy[:, k > 16].sum()
    assert low > 100 * high


def test_cfl_substepping():
    chain = KolmogorovFlow(size=256, dt=0.2)
    # Mirrors the reference setup (sda/mcs.py:274-284): dx = 2pi/256,
    # dt_min = 0.5 * dx / 5 ~ 2.45e-3 -> ~82 substeps.
    assert 60 <= chain.steps <= 120

    chain_small = KolmogorovFlow(size=64, dt=0.001)
    assert chain_small.steps <= 2


def test_trajectory_matches_repeated_transitions():
    chain = KolmogorovFlow(size=32, dt=0.05)
    x = chain.prior(jax.random.key(3), ())

    xs = chain.trajectory(jax.random.key(0), x, length=3)

    y = x
    for _ in range(3):
        y = chain.transition(None, y)

    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(y), atol=1e-3)


def test_forced_flow_reaches_finite_statistics():
    r"""The forced-dissipative system must stay bounded (energy balance
    between forcing injection and drag/viscous dissipation)."""

    chain = KolmogorovFlow(size=64, dt=0.2)
    x = chain.prior(jax.random.key(4), ())
    x = chain.trajectory(jax.random.key(0), x, length=20, last=True)

    x = np.asarray(x)
    assert np.all(np.isfinite(x))
    rms = np.sqrt(np.mean(x**2))
    assert 0.1 < rms < 10.0


def test_long_horizon_stability_at_cfl():
    r"""Regression: the stage scheme must be imaginary-axis stable at the
    advective CFL. Midpoint RK2 passes short runs but blows up over long
    horizons once turbulence fills the 2/3-cutoff wavenumbers (observed at
    256^2; 128^2 runs at the same CFL ratio and is a cheaper proxy)."""

    chain = KolmogorovFlow(size=128, dt=0.2)
    x = chain.prior(jax.random.key(7), ())
    xs = chain.trajectory(jax.random.key(0), x, length=30)

    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))

    rms = np.sqrt((xs**2).mean(axis=(1, 2, 3)))
    assert rms[-1] < 5.0  # forced-dissipative balance, no blow-up


def test_transition_is_jittable_and_batched():
    chain = KolmogorovFlow(size=32, dt=0.05)
    x = chain.prior(jax.random.key(5), (3,))

    step = jax.jit(lambda x: chain.transition(None, x))
    y = step(x)

    assert y.shape == (3, 2, 32, 32)
    # Batch elements evolve independently.
    y0 = chain.transition(None, x[0])
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), atol=1e-4)
