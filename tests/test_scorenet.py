r"""Tests for score networks (ScoreNet / ScoreUNet / LocalScoreUNet)."""

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.diffusion import (
    LocalScoreUNet,
    MCScoreNet,
    ScoreNet,
    ScoreUNet,
    VPSDE,
    bind_eps,
)


def test_scorenet_shapes():
    module = ScoreNet(features=15, embedding=16, hidden_features=(32, 32))
    x = jnp.ones((4, 15))
    t = jnp.ones((4,))
    params = module.init(jax.random.key(0), x, t)['params']

    eps = bind_eps(module, params)
    out = eps(x, t)
    assert out.shape == (4, 15)

    # Scalar t broadcasts.
    out = eps(x, jnp.asarray(0.5))
    assert out.shape == (4, 15)


def test_scorenet_with_context():
    module = ScoreNet(features=6, embedding=8)
    x = jnp.ones((4, 6))
    t = jnp.ones((4,))
    c = jnp.ones((4, 3))
    params = module.init(jax.random.key(0), x, t, c)['params']

    out = module.apply({'params': params}, x, t, c)
    assert out.shape == (4, 6)


def test_scoreunet_shapes_2d():
    module = ScoreUNet(
        channels=4,
        embedding=16,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        spatial=2,
    )
    x = jnp.ones((2, 4, 16, 16))
    t = jnp.ones((2,))
    params = module.init(jax.random.key(0), x, t)['params']

    out = module.apply({'params': params}, x, t)
    assert out.shape == (2, 4, 16, 16)


def test_scoreunet_extra_batch_axes():
    r"""ScoreUNet flattens leading batch axes around the network call
    (reference sda/score.py:89-93) — needed for windowed evaluation."""

    module = ScoreUNet(
        channels=2, embedding=8, hidden_channels=(8,), hidden_blocks=(1,),
        spatial=2,
    )
    x = jnp.ones((2, 2, 16, 16))
    t = jnp.ones(())
    params = module.init(jax.random.key(0), x, t)['params']

    xw = jnp.ones((3, 5, 2, 16, 16))  # (B, windows, C, H, W)
    out = module.apply({'params': params}, xw, jnp.asarray(0.3))
    assert out.shape == (3, 5, 2, 16, 16)


def test_local_score_unet_ignores_context():
    module = LocalScoreUNet(
        channels=2, size=16, embedding=8,
        hidden_channels=(8,), hidden_blocks=(1,),
    )
    x = jnp.ones((2, 2, 16, 16))
    t = jnp.ones((2,))
    params = module.init(jax.random.key(0), x, t)['params']

    out1 = module.apply({'params': params}, x, t)
    out2 = module.apply({'params': params}, x, t, jnp.zeros((1, 16, 16)))

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_windowed_unet_composition_end_to_end():
    r"""The flagship composition: MCScoreNet(kernel=ScoreUNet on windows)
    scores a longer trajectory, and the result feeds VPSDE.sample."""

    order, channels = 1, 2
    kernel_module = ScoreUNet(
        channels=(2 * order + 1) * channels,
        embedding=8,
        hidden_channels=(8,),
        hidden_blocks=(1,),
        spatial=2,
    )

    xw = jnp.ones((1, (2 * order + 1) * channels, 8, 8))
    params = kernel_module.init(jax.random.key(0), xw, jnp.ones(()))['params']

    score = MCScoreNet(bind_eps(kernel_module, params), order=order)

    L = 7
    sde = VPSDE(eps=score, shape=(L, channels, 8, 8))
    x = sde.sample(jax.random.key(1), shape=(2,), steps=4)

    assert x.shape == (2, L, channels, 8, 8)
    assert np.all(np.isfinite(np.asarray(x)))


def test_scorenet_loss_decreases_quickly():
    r"""Statistical smoke test: a few optimizer steps on a toy dataset
    reduce the denoising loss."""

    import optax

    module = ScoreNet(features=3, embedding=8, hidden_features=(32,))
    sde = VPSDE(shape=(3,))

    x_data = jax.random.normal(jax.random.key(0), (512, 3))

    params = module.init(jax.random.key(1), x_data[:1], jnp.ones((1,)))['params']
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return sde.loss(key, x_data, eps=bind_eps(module, p))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.key(2)
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))

    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8
