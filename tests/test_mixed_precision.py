r"""Tests for bf16 mixed-precision network compute (params stay f32)."""

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.diffusion import ScoreNet, ScoreUNet, VPSDE, bind_eps


def test_bf16_unet_dtypes():
    module = ScoreUNet(
        channels=2, embedding=8, hidden_channels=(8,), hidden_blocks=(1,),
        spatial=2, dtype=jnp.bfloat16,
    )
    x = jnp.ones((2, 2, 16, 16))
    t = jnp.ones((2,))
    params = module.init(jax.random.key(0), x, t)['params']

    # Params stay float32; outputs match the input dtype.
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32

    out = module.apply({'params': params}, x, t)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_bf16_close_to_f32():
    r"""Same params evaluated in bf16 vs f32 compute agree to bf16 accuracy."""

    kwargs = dict(
        features=6, embedding=8, hidden_features=(32,), activation=jax.nn.silu
    )
    m32 = ScoreNet(**kwargs)
    m16 = ScoreNet(**kwargs, dtype=jnp.bfloat16)

    x = jax.random.normal(jax.random.key(1), (16, 6))
    t = jnp.full((16,), 0.3)
    params = m32.init(jax.random.key(0), x, t)['params']

    out32 = np.asarray(m32.apply({'params': params}, x, t))
    out16 = np.asarray(m16.apply({'params': params}, x, t))

    scale = np.abs(out32).max()
    np.testing.assert_allclose(out16, out32, atol=0.1 * scale)


def test_bf16_training_step_reduces_loss():
    import optax

    module = ScoreNet(
        features=4, embedding=8, hidden_features=(32,), dtype=jnp.bfloat16
    )
    sde = VPSDE(shape=(4,))
    x_data = jax.random.normal(jax.random.key(0), (256, 4))

    params = module.init(jax.random.key(1), x_data[:1], jnp.ones((1,)))['params']
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: sde.loss(key, x_data, eps=bind_eps(module, p))
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.key(2)
    for _ in range(40):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))

    assert np.mean(losses[-10:]) < np.mean(losses[:10])
