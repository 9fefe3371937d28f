r"""Unit tests for the dynamical-system layer (ODE systems + grid ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.dynamics import (
    DampedSpring,
    Lorenz63,
    Lorenz96,
    LotkaVolterra,
    NoisyLorenz63,
    coarsen,
    rk4,
    upsample,
    vorticity,
)


def test_rk4_convergence_order():
    r"""RK4 must show ~4th-order convergence on dx/dt = -x."""

    # rk4 is dtype-generic pure arithmetic: run in float64 via numpy so the
    # measured convergence rate is not polluted by float32 rounding.
    f = lambda x: -x
    x0 = np.float64(1.0)
    T = 1.0

    errors = []
    for n in (8, 16, 32):
        dt = T / n
        x = x0
        for _ in range(n):
            x = rk4(f, x, dt)
        errors.append(abs(float(x) - np.exp(-1.0)))

    rate1 = np.log2(errors[0] / errors[1])
    rate2 = np.log2(errors[1] / errors[2])

    assert 3.5 < rate1 < 4.5
    assert 3.5 < rate2 < 4.5


def test_lorenz63_prior_statistics():
    chain = Lorenz63(dt=0.025)
    x = chain.prior(jax.random.key(0), (20000,))

    np.testing.assert_allclose(
        np.mean(np.asarray(x), axis=0), [0.0, 0.0, 25.0], atol=0.5
    )
    np.testing.assert_allclose(
        np.std(np.asarray(x), axis=0), [8.0, 9.0, np.sqrt(75)], atol=0.3
    )


def test_lorenz63_stays_on_attractor():
    chain = Lorenz63(dt=0.025)
    x = chain.prior(jax.random.key(0), (16,))
    x = chain.trajectory(jax.random.key(1), x, length=500, last=True)

    # The attractor is bounded; standardized coordinates are O(1).
    z = np.asarray(chain.preprocess(x))
    assert np.all(np.abs(z) < 10)


def test_lorenz63_pre_post_roundtrip():
    x = jax.random.normal(jax.random.key(2), (7, 3)) * 10
    y = Lorenz63.postprocess(Lorenz63.preprocess(x))

    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_noisy_lorenz63_log_prob():
    chain = NoisyLorenz63(dt=0.025)
    x1 = chain.prior(jax.random.key(0), (512,))
    x2 = chain.transition(jax.random.key(1), x1)

    # Transitions sampled from the true kernel have high log-prob; shuffled
    # pairs have (much) lower.
    lp_true = np.mean(np.asarray(chain.log_prob(x1, x2)))
    lp_fake = np.mean(np.asarray(chain.log_prob(x1, x2[::-1])))

    assert lp_true > lp_fake + 100


def test_noisy_lorenz63_moments():
    chain = NoisyLorenz63(dt=0.025)
    x = chain.prior(jax.random.key(0), (4,))
    mean, std = chain.moments(x)

    assert mean.shape == x.shape
    np.testing.assert_allclose(float(std), np.sqrt(0.025), atol=1e-6)


def test_lorenz96_shape_and_dynamics():
    chain = Lorenz96(n=32, dt=0.01)
    x = chain.prior(jax.random.key(0), (5,))
    assert x.shape == (5, 32)

    xs = chain.trajectory(jax.random.key(1), x, length=50)
    assert xs.shape == (50, 5, 32)
    assert np.all(np.isfinite(np.asarray(xs)))


def test_lotka_volterra_conserved_quantity():
    r"""The (log-space) Lotka-Volterra system conserves
    V = delta e^x + beta e^y - gamma x - alpha y."""

    chain = LotkaVolterra(dt=0.01)
    x = chain.prior(jax.random.key(0), (8,))

    def V(x):
        return (
            np.exp(np.asarray(x[..., 0]))
            + np.exp(np.asarray(x[..., 1]))
            - np.asarray(x[..., 0])
            - np.asarray(x[..., 1])
        )

    v0 = V(x)
    xs = chain.trajectory(jax.random.key(1), x, length=200, last=True)
    v1 = V(xs)

    np.testing.assert_allclose(v1, v0, rtol=1e-4)


def test_damped_spring_runs():
    chain = DampedSpring(dt=0.01)
    x = chain.prior(jax.random.key(0), (6,))
    assert x.shape == (6, 4)

    xs = chain.trajectory(jax.random.key(1), x, length=20)
    assert xs.shape == (20, 6, 4)
    assert np.all(np.isfinite(np.asarray(xs)))


def test_trajectory_last_matches_full():
    chain = Lorenz63(dt=0.02)
    x = chain.prior(jax.random.key(0), (3,))

    full = chain.trajectory(jax.random.key(1), x, length=10)
    last = chain.trajectory(jax.random.key(1), x, length=10, last=True)

    np.testing.assert_allclose(np.asarray(full[-1]), np.asarray(last), atol=1e-5)


# -- Grid operators --------------------------------------------------------


def test_coarsen_mean_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4)
    y = coarsen(x, 2)

    want = np.array([[[2.5, 4.5], [10.5, 12.5]]])
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-6)


def test_coarsen_upsample_consistency():
    r"""coarsen(upsample(x, r), r) ~ x for smooth periodic fields."""

    n = 32
    t = jnp.linspace(0, 2 * np.pi, n, endpoint=False)
    x = jnp.sin(t)[None, :, None] * jnp.cos(t)[None, None, :]

    y = coarsen(upsample(x, 2), 2)

    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0.05)


def test_upsample_nearest_shape():
    x = jax.random.normal(jax.random.key(0), (2, 3, 8, 8))
    y = upsample(x, 2, mode='nearest')
    assert y.shape == (2, 3, 16, 16)


def test_vorticity_analytic():
    r"""For u = sin(b), v = 0 on the unit-spaced grid, the reference's
    convention gives du/db = cos(b) (axis -1 central difference)."""

    n = 64
    b = 2 * np.pi / n * np.arange(n)
    u = np.tile(np.sin(b), (n, 1))
    v = np.zeros((n, n))
    x = jnp.asarray(np.stack([u, v])[None])

    w = np.asarray(vorticity(x))[0]

    # Central difference of sin on integer-index grid: cos(b) * sin(h)/h
    # with h = 2 pi / n radians per index step.
    h = 2 * np.pi / n
    want = np.tile(np.cos(b) * np.sin(h), (n, 1))

    np.testing.assert_allclose(w, want, atol=1e-4)


def test_ops_are_differentiable():
    x = jax.random.normal(jax.random.key(1), (2, 2, 16, 16))

    for fn in [
        lambda x: jnp.sum(coarsen(x, 2) ** 2),
        lambda x: jnp.sum(upsample(x, 2) ** 2),
        lambda x: jnp.sum(vorticity(x) ** 2),
    ]:
        g = jax.grad(fn)(x)
        assert g.shape == x.shape
        assert np.all(np.isfinite(np.asarray(g)))
