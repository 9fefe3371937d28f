r"""Unit tests for NN primitives (layers + U-Net)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.nn import ResMLP, TimeEmbedding, UNet, layer_norm


def test_layer_norm_standardizes():
    x = jax.random.normal(jax.random.key(0), (4, 32)) * 3 + 1

    y = layer_norm(x, axis=-1)

    np.testing.assert_allclose(np.mean(y, axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.var(y, axis=-1), 1.0, atol=1e-3)


def test_layer_norm_has_no_parameters():
    # Non-affine by design (zuko-style): pure function, nothing learnable.
    x = jnp.ones((2, 8))
    assert layer_norm(x).shape == (2, 8)


def test_time_embedding_shapes_and_range():
    module = TimeEmbedding(features=32)
    params = module.init(jax.random.key(0), jnp.zeros(()))

    for shape in [(), (5,), (3, 4)]:
        t = jnp.zeros(shape)
        out = module.apply(params, t)
        assert out.shape == shape + (32,)


def test_time_embedding_periodic_features():
    # The raw features are cos/sin(pi k t): t=0 and t=2 must embed equally.
    module = TimeEmbedding(features=8)
    params = module.init(jax.random.key(0), jnp.zeros(()))

    a = module.apply(params, jnp.asarray(0.0))
    b = module.apply(params, jnp.asarray(2.0))

    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resmlp_shapes():
    module = ResMLP(out_features=3, hidden_features=(64, 64, 64))
    x = jnp.ones((7, 10))
    params = module.init(jax.random.key(0), x)

    y = module.apply(params, x)
    assert y.shape == (7, 3)


def test_resmlp_no_redundant_projection():
    # When consecutive widths match, no width-changing Dense is inserted.
    module = ResMLP(out_features=8, hidden_features=(8,))
    x = jnp.ones((2, 8))
    params = module.init(jax.random.key(0), x)

    n_dense = len(jax.tree_util.tree_leaves(params)) // 2  # kernel+bias each
    # 1 block per width transition, 2 Dense per block, 0 projections.
    assert n_dense == 4


@pytest.mark.parametrize('spatial', [1, 2])
def test_unet_shapes(spatial):
    size = (16,) * spatial
    module = UNet(
        out_channels=3,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        spatial=spatial,
    )

    x = jnp.ones((2, *size, 5))
    y = jnp.ones((2, 32))
    params = module.init(jax.random.key(0), x, y)

    out = module.apply(params, x, y)
    assert out.shape == (2, *size, 3)


def test_unet_modulation_has_effect():
    module = UNet(out_channels=2, hidden_channels=(8,), hidden_blocks=(1,), spatial=1)

    x = jax.random.normal(jax.random.key(1), (1, 16, 2))
    y0 = jnp.zeros((1, 4))
    y1 = jnp.ones((1, 4))
    params = module.init(jax.random.key(0), x, y0)

    out0 = module.apply(params, x, y0)
    out1 = module.apply(params, x, y1)

    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_unet_circular_padding_is_shift_equivariant():
    # With periodic padding, a cyclic shift of the input must produce a
    # cyclic shift of the output (strided levels: shift by the total stride).
    module = UNet(
        out_channels=1,
        hidden_channels=(4, 8),
        hidden_blocks=(1, 1),
        spatial=2,
        circular=True,
    )

    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 1))
    y = jnp.ones((1, 4))
    params = module.init(jax.random.key(0), x, y)

    out = module.apply(params, x, y)
    out_shifted = module.apply(params, jnp.roll(x, 4, axis=1), y)

    np.testing.assert_allclose(
        np.asarray(jnp.roll(out, 4, axis=1)),
        np.asarray(out_shifted),
        atol=1e-4,
    )
