r"""Tests for the evaluation stack (BPF, EMD/MMD, L-BFGS / 4D-Var)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.eval import bpf, emd, lbfgs_minimize, mmd, sinkhorn, weak_4d_var


def test_emd_identical_sets_is_zero():
    x = jax.random.normal(jax.random.key(0), (64, 3))
    # float32 cancellation in the pairwise-distance matrix leaves ~1e-4 noise
    assert emd(x, x) < 1e-3


def test_emd_translation():
    r"""EMD between N(0, eps) and N(mu, eps) point clouds ~ |mu|."""

    x = jax.random.normal(jax.random.key(0), (256, 2)) * 0.01
    y = x + jnp.asarray([3.0, 4.0])  # |mu| = 5

    np.testing.assert_allclose(emd(x, y), 5.0, rtol=0.01)


def test_emd_is_symmetric():
    x = jax.random.normal(jax.random.key(1), (128, 4))
    y = jax.random.normal(jax.random.key(2), (128, 4)) + 1.0

    np.testing.assert_allclose(emd(x, y), emd(y, x), rtol=1e-5)


def test_sinkhorn_approximates_emd():
    x = jax.random.normal(jax.random.key(3), (128, 2))
    y = jax.random.normal(jax.random.key(4), (128, 2)) + 2.0

    exact = emd(x, y)
    approx = float(sinkhorn(x, y, reg=0.01, iterations=500))

    assert abs(approx - exact) / exact < 0.1


def test_wasserstein_gate_calibration():
    r"""The Kolmogorov eval's Sinkhorn Wasserstein gate (the production
    call site of :func:`sinkhorn`): ratio ~= 1 for same-distribution frames
    with UNEQUAL counts (where the exact LAP path does not apply), clearly
    > 1 for a shifted distribution."""

    import importlib.util
    import sys
    from pathlib import Path

    pack = Path(__file__).resolve().parents[1] / 'experiments/kolmogorov'
    saved = {n: sys.modules.pop(n, None) for n in ('utils', 'assimilate')}
    sys.path.insert(0, str(pack))
    try:
        spec = importlib.util.spec_from_file_location(
            'kolmogorov_eval', pack / 'eval.py'
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
        for n, m in saved.items():
            sys.modules.pop(n, None)
            if m is not None:
                sys.modules[n] = m

    key = jax.random.key(8)
    test_frames = jax.random.normal(key, (96, 2, 8, 8))
    same = jax.random.normal(jax.random.key(9), (40, 2, 8, 8))
    shifted = same + 2.0

    _, floor, ratio_same = mod.wasserstein_gate(same, test_frames)
    _, _, ratio_shift = mod.wasserstein_gate(shifted, test_frames)

    assert floor > 0
    assert 0.8 < ratio_same < 1.3
    assert ratio_shift > ratio_same * 1.2


def test_mmd_zero_for_same_distribution():
    x = jax.random.normal(jax.random.key(5), (512, 3))
    y = jax.random.normal(jax.random.key(6), (512, 3))
    z = jax.random.normal(jax.random.key(7), (512, 3)) + 2.0

    close = float(mmd(x, y))
    far = float(mmd(x, z))

    assert close < 0.05
    assert far > 10 * close


def test_lbfgs_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])
    fun = lambda x: jnp.sum((x - target) ** 2)

    x = lbfgs_minimize(fun, jnp.zeros(3), iterations=50)

    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-4)


def test_lbfgs_rosenbrock():
    def rosen(x):
        return jnp.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    x = lbfgs_minimize(rosen, jnp.zeros(4), iterations=200)

    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-3)


def test_bpf_linear_gaussian_posterior():
    r"""On a 1-D linear-Gaussian model the BPF must match the Kalman-filter
    posterior: x' = a x + noise(q), y = x + noise(r)."""

    a, q, r = 0.9, 0.1, 0.05
    m = 2**14

    def transition(key, x):
        return a * x + np.sqrt(q) * jax.random.normal(key, x.shape)

    def log_likelihood(y, x):
        return -0.5 * (y - x[:, 0]) ** 2 / r

    # Ground truth via Kalman filtering on a fixed observation sequence.
    ys = np.array([0.5, 0.8, 0.2, -0.1, 0.4])

    mean, var = 0.0, 1.0
    for y in ys:
        mean, var = a * mean, a**2 * var + q  # predict
        k_gain = var / (var + r)  # update
        mean = mean + k_gain * (y - mean)
        var = (1 - k_gain) * var

    x0 = jax.random.normal(jax.random.key(8), (m, 1))
    hist = bpf(
        jax.random.key(9),
        x0,
        jnp.asarray(ys)[:, None],
        transition,
        log_likelihood,
        step=1,
    )

    samples = np.asarray(hist[:, -1, 0])

    np.testing.assert_allclose(samples.mean(), mean, atol=0.05)
    np.testing.assert_allclose(samples.var(), var, rtol=0.25)


def test_bpf_history_shape_and_step():
    m, n, step = 128, 4, 3

    transition = lambda key, x: x + 0.1 * jax.random.normal(key, x.shape)
    log_likelihood = lambda y, x: -jnp.sum((y - x) ** 2, axis=-1)

    x0 = jax.random.normal(jax.random.key(0), (m, 2))
    y = jax.random.normal(jax.random.key(1), (n, 2))

    hist = bpf(jax.random.key(2), x0, y, transition, log_likelihood, step=step)

    assert hist.shape == (m, n * step + 1, 2)
    assert np.all(np.isfinite(np.asarray(hist)))


def test_weak_4d_var_recovers_smooth_trajectory():
    r"""With a random-walk prior and direct noisy observations, 4D-Var should
    pull the estimate toward the observations."""

    key = jax.random.key(10)
    truth = jnp.cumsum(0.1 * jax.random.normal(key, (20, 1)), axis=0)
    y = truth + 0.01 * jax.random.normal(jax.random.key(11), truth.shape)

    def log_prior(x):
        return -jnp.sum((x[1:] - x[:-1]) ** 2) / (2 * 0.1**2)

    def log_likelihood(y, x):
        return -jnp.sum((y - x) ** 2) / (2 * 0.01**2)

    x0 = jnp.zeros_like(truth)
    x = weak_4d_var(x0, y, log_prior, log_likelihood, iterations=100)

    rmse_before = float(jnp.sqrt(jnp.mean((x0 - truth) ** 2)))
    rmse_after = float(jnp.sqrt(jnp.mean((x - truth) ** 2)))

    assert rmse_after < 0.2 * rmse_before
