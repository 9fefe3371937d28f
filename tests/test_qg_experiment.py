r"""Integration tests for the quasi-geostrophic experiment pack: factories,
the multi-field 'upper' observation operator, and a tiny guided sample."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / 'experiments/qg'))
for name in ('utils', 'assimilate'):
    sys.modules.pop(name, None)

import utils as qg_utils  # noqa: E402
from assimilate import get_scenario  # noqa: E402

# Leave no cached same-named modules behind for other packs' tests.
for name in ('utils', 'assimilate'):
    sys.modules.pop(name, None)
sys.path.pop(0)

from sda_tpu.diffusion import GaussianScore, VPSDE  # noqa: E402


def tiny_score(window=3, size=16):
    module = qg_utils.make_score(
        window=window,
        embedding=8,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        size=size,
    )
    params = qg_utils.init_score(module, size=size)
    return module, params


def test_qg_factories_shapes():
    window, size = 3, 16
    module, params = tiny_score(window, size)

    out = module.apply(
        {'params': params}, jnp.ones((4, window * 2, size, size)), jnp.ones((4,))
    )
    assert out.shape == (4, window * 2, size, size)


def test_qg_trajectory_eps_and_guided_sample():
    window, size, length = 3, 16, 8
    module, params = tiny_score(window, size)
    score = qg_utils.make_trajectory_eps(module, params, window=window)

    x = jax.random.normal(jax.random.key(0), (2, length, 2, size, size))
    e = score(x, jnp.float32(0.5))
    assert e.shape == x.shape

    # 'upper' observation operator: only layer 1, coarsened.
    A = lambda x: qg_utils.QuasiGeostrophic.coarsen(x[..., ::2, :1, :, :], 4)
    y = A(x[0, :length])

    sde = VPSDE(
        eps=GaussianScore(
            y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
        ),
        shape=(length, 2, size, size),
    )
    xs = sde.sample(jax.random.key(1), (2,), steps=4, corrections=1, tau=0.5)

    assert xs.shape == (2, length, 2, size, size)
    assert np.all(np.isfinite(np.asarray(xs)))


def test_qg_scenarios_build():
    # Both the production resolution and a smaller one: the scenario
    # operators and the sampling shapes must follow the data, not a
    # hard-coded 64^2 grid (regression: assimilate.py once sampled at 64^2
    # regardless of the dataset resolution).
    for size in (64, 16):
        rng = np.random.RandomState(0)
        x_star = rng.standard_normal((16, 2, size, size)).astype(np.float32)

        for name in ('upper', 'coarse', 'subsample'):
            A, y, std, length, gamma = get_scenario(name, x_star, rng)
            assert np.all(np.isfinite(np.asarray(y)))
            assert A(jnp.asarray(x_star[:length])).shape == y.shape
            # The guidance residual A(x) - y must broadcast for a batch of
            # samples at the data's own resolution.
            batch = jnp.asarray(
                np.stack([x_star[:length], x_star[:length]])
            )
            assert (A(batch) - y).shape == (2, *y.shape)

    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 64, 64)).astype(np.float32)

    # 'upper' must be blind to the bottom layer.
    A, y, std, length, gamma = get_scenario('upper', x_star, rng)
    x2 = x_star[:length].copy()
    x2[:, 1] += 123.0
    assert np.allclose(
        np.asarray(A(jnp.asarray(x_star[:length]))), np.asarray(A(jnp.asarray(x2)))
    )
