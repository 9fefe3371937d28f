r"""Scenario-catalog tests: the exact reference observation operators
(extrapolation = coarsen-then-patch, offset subsampling grids) build,
differentiate, and match their stated geometry (figures.ipynb cells 16/30-41,
figures_bis.ipynb cells 5-10)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]

# Each experiment pack has its own utils.py/assimilate.py; load by path so
# same-named modules from other packs (already cached by other test files)
# cannot shadow these.
sys.path.insert(0, str(REPO / 'experiments/kolmogorov'))
for name in ('utils', 'assimilate'):
    sys.modules.pop(name, None)

from assimilate import get_scenario  # noqa: E402

for name in ('utils', 'assimilate'):
    sys.modules.pop(name, None)
sys.path.pop(0)


def test_extrapolate_geometry():
    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 64, 64)).astype(np.float32)

    A, y, std, length, gamma = get_scenario('extrapolate', x_star, rng)

    # coarsen(x, 4)[..., ::3, :, 4:12, 4:12]: 8 frames -> every 3rd (3),
    # 16x16 coarse grid -> central 8x8 patch.
    assert y.shape == (3, 2, 8, 8)
    assert std == 0.01

    # Differentiable (used inside the guidance VJP).
    g = jax.grad(lambda x: jnp.sum(A(x) ** 2))(jnp.asarray(x_star[:length]))
    assert np.all(np.isfinite(np.asarray(g)))

    # Blind outside the observed coarse patch: perturbing a corner pixel
    # (coarse cell 0,0) must not change A(x).
    x2 = x_star[:length].copy()
    x2[..., :4, :4] += 7.0
    assert np.allclose(
        np.asarray(A(jnp.asarray(x_star[:length]))), np.asarray(A(jnp.asarray(x2)))
    )


def test_subsample_strides_and_offset():
    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 64, 64)).astype(np.float32)

    for stride in (2, 4, 8, 16):
        A, y, std, length, gamma = get_scenario(
            'subsample', x_star, rng, stride=stride
        )
        assert y.shape == (8, 2, 64 // stride, 64 // stride)
        assert std == 0.1

    # Offset grid 7::16 (figures_bis.ipynb cell 9).
    A, y, std, length, gamma = get_scenario(
        'subsample', x_star, rng, stride=16, offset=7
    )
    assert y.shape == (8, 2, 4, 4)
    expected = x_star[:8][..., 7::16, 7::16]
    got = np.asarray(A(jnp.asarray(x_star[:8])))
    assert np.allclose(got, expected)


def test_saturation_geometry():
    r"""Reference figures.ipynb cell 23: coarsen 4x every 3rd frame,
    vorticity, w/(1+|w|), central 12x12 coarse patch."""

    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 64, 64)).astype(np.float32)

    A, y, std, length, gamma = get_scenario('saturation', x_star, rng)

    assert length == 8
    assert y.shape == (3, 12, 12)  # 8 frames ::3 -> 3; 16x16 grid -> [2:14]
    assert std == 0.05

    # Saturation bounds |A| < 1 (before observation noise).
    out = np.asarray(A(jnp.asarray(x_star[:length])))
    assert np.all(np.abs(out) < 1.0)

    g = jax.grad(lambda x: jnp.sum(A(x) ** 2))(jnp.asarray(x_star[:length]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_size_relative_geometry_128():
    r"""The scenario catalog is size-relative (round 4): at 128^2 the
    operators scale with the grid, and at 64^2 they reduce exactly to the
    reference's notebook values (covered by the other tests here)."""

    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 128, 128)).astype(np.float32)

    # patch: central quarter -> [48:80] at 128 (24:40 at 64).
    A, y, std, length, gamma = get_scenario('patch', x_star, rng)
    assert y.shape == (6, 2, 32, 32)
    expected = x_star[:length][..., ::3, :, 48:80, 48:80]
    assert np.allclose(np.asarray(A(jnp.asarray(x_star[:length]))), expected)

    # extrapolate: 4x coarsen -> 32x32 grid, central half patch [8:24].
    A, y, std, length, gamma = get_scenario('extrapolate', x_star, rng)
    assert y.shape == (3, 2, 16, 16)

    # saturation: 4x coarsen -> 32x32 grid, central 3/4 patch [4:28].
    A, y, std, length, gamma = get_scenario('saturation', x_star, rng)
    assert y.shape == (3, 24, 24)

    # circle mask and loop target follow the grid.
    A, y, std, length, gamma = get_scenario('circle', x_star, rng)
    assert y.shape == (128, 128)
    A, y, std, length, gamma = get_scenario('loop', x_star, rng)
    assert y.shape == (2, 128, 128)

    g = jax.grad(lambda x: jnp.sum(A(x) ** 2))(jnp.asarray(x_star[:8]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_circle_geometry():
    r"""Reference figures.ipynb cell 4: last frame's vorticity times a ring
    mask, synthetic target 0.6 on the ring."""

    rng = np.random.RandomState(0)
    x_star = rng.standard_normal((16, 2, 64, 64)).astype(np.float32)

    A, y, std, length, gamma = get_scenario('circle', x_star, rng)

    assert length == 8
    assert y.shape == (64, 64)
    assert std == 0.2

    mask = np.asarray(y) > 0
    assert 0 < mask.sum() < 64 * 64  # a ring, not empty / full
    assert np.allclose(np.asarray(y)[mask], 0.6)

    # Only the LAST frame is observed.
    x2 = x_star[:length].copy()
    x2[:-1] += 3.0
    assert np.allclose(
        np.asarray(A(jnp.asarray(x_star[:length]))), np.asarray(A(jnp.asarray(x2)))
    )

    g = jax.grad(lambda x: jnp.sum(A(x) ** 2))(jnp.asarray(x_star[:length]))
    assert np.all(np.isfinite(np.asarray(g)))
