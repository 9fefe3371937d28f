r"""Unit tests for the windowed Markov-blanket score decomposition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.diffusion import MCScoreNet, MCScoreWrapper, fold, unfold


def naive_unfold(x, order):
    r"""Oracle: loop-built sliding windows, frame-major channel merge."""

    x = np.asarray(x)
    b, length, c = x.shape[:3]
    k = 2 * order + 1
    out = np.stack(
        [
            np.concatenate([x[:, i + j] for j in range(k)], axis=1)
            for i in range(length - k + 1)
        ],
        axis=1,
    )
    return out


@pytest.mark.parametrize('order', [1, 2, 3])
@pytest.mark.parametrize('spatial', [(), (5,), (4, 4)])
def test_unfold_matches_oracle(order, spatial):
    x = jax.random.normal(jax.random.key(0), (2, 12, 3, *spatial))

    got = unfold(x, order)
    want = naive_unfold(x, order)

    assert got.shape == (2, 12 - 2 * order, (2 * order + 1) * 3, *spatial)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


@pytest.mark.parametrize('order', [1, 2, 3])
def test_fold_unfold_identity(order):
    r"""fold(unfold(x)) must reproduce the sequence exactly (the numeric
    identity verified in SURVEY.md §4): the first window supplies the leading
    k frames, centers supply the middle, the last window the trailing k."""

    x = jax.random.normal(jax.random.key(1), (2, 11, 3, 4))

    y = fold(unfold(x, order), order)

    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_mc_score_net_uses_kernel_per_window():
    r"""With an identity kernel, the composed score is the identity."""

    order = 2
    net = MCScoreNet(kernel=lambda x, t, c=None: x, order=order)

    x = jax.random.normal(jax.random.key(2), (3, 9, 2))
    out = net(x, jnp.asarray(0.5))

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_mc_score_net_center_selection():
    r"""A kernel that adds its window index (via a marker on the center
    frame) lets us verify which window each output frame comes from."""

    order = 1
    length = 6

    def kernel(xw, t, c=None):
        # xw: (B, L', 3*C); add 100*window_index to every entry.
        idx = jnp.arange(xw.shape[1], dtype=xw.dtype)[None, :, None]
        return xw + 100 * idx

    net = MCScoreNet(kernel=kernel, order=order)
    x = jnp.zeros((1, length, 1))
    out = net(x, jnp.asarray(0.0))

    # Frames: frame 0 from window 0, frames 1..L-2 from their centered
    # windows (window i-1), frame L-1 from the last window (L-3).
    want = np.array([0, 0, 100, 200, 300, 300], dtype=np.float32)[None, :, None]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_mc_score_wrapper_transposes():
    calls = {}

    def score(x, t, c=None):
        calls['shape'] = x.shape
        return x * 2

    wrapper = MCScoreWrapper(score)
    x = jax.random.normal(jax.random.key(3), (2, 8, 3))

    out = wrapper(x, jnp.asarray(0.1))

    assert calls['shape'] == (2, 3, 8)  # channel-first for the spatial net
    np.testing.assert_allclose(np.asarray(out), np.asarray(2 * x), atol=1e-6)


@pytest.mark.parametrize('chunk', [1, 3, 8, 64])
def test_chunked_mc_score_matches_unchunked(chunk):
    r"""Sequential chunked window evaluation (memory-optimal mode) must be
    numerically identical to the single batched evaluation."""

    order = 2

    def kernel(xw, t, c=None):
        return jnp.tanh(xw) * (1 + t) + 0.5

    full = MCScoreNet(kernel, order=order)
    chunked = MCScoreNet(kernel, order=order, chunk=chunk)

    x = jax.random.normal(jax.random.key(5), (2, 17, 3))
    t = jnp.asarray(0.4)

    np.testing.assert_allclose(
        np.asarray(full(x, t)), np.asarray(chunked(x, t)), atol=1e-6
    )


def test_chunked_mc_score_jit_and_grad():
    kernel = lambda xw, t, c=None: jnp.sin(xw)
    net = MCScoreNet(kernel, order=1, chunk=4)

    def loss(x):
        return jnp.sum(net(x, jnp.asarray(0.5)) ** 2)

    x = jax.random.normal(jax.random.key(6), (1, 11, 2))
    g = jax.jit(jax.grad(loss))(x)

    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_chunked_remat_matches_plain():
    r"""Chunk + per-chunk remat (the beyond-HBM mode): values and gradients
    must match the plain batched path exactly — remat only changes what the
    VJP stores, not what it computes."""

    def kernel(xw, t, c=None):
        return jnp.tanh(xw) * (1 + t) + 0.1 * xw**2

    plain = MCScoreNet(kernel, order=2)
    lever = MCScoreNet(kernel, order=2, chunk=4, remat=True)

    x = jax.random.normal(jax.random.key(7), (2, 17, 3))
    t = jnp.asarray(0.3)

    np.testing.assert_allclose(
        np.asarray(plain(x, t)), np.asarray(lever(x, t)), atol=1e-6
    )

    loss_plain = lambda x: jnp.sum(plain(x, t) ** 2)
    loss_lever = lambda x: jnp.sum(lever(x, t) ** 2)
    np.testing.assert_allclose(
        np.asarray(jax.jit(jax.grad(loss_plain))(x)),
        np.asarray(jax.jit(jax.grad(loss_lever))(x)),
        atol=1e-5,
    )


def test_unfold_gradient_flows():
    r"""Guided sampling differentiates through unfold/kernel/fold."""

    def f(x):
        y = fold(unfold(x, 1) * 2.0, 1)
        return jnp.sum(y**2)

    x = jax.random.normal(jax.random.key(4), (1, 7, 2))
    g = jax.grad(f)(x)

    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))
