r"""Integration tests for the experiment packs (factories, likelihoods,
classical baselines) — the L4 layer of SURVEY.md §1."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / 'experiments/lorenz'))

import utils as lorenz_utils  # noqa: E402

sys.path.pop(0)
sys.path.insert(0, str(REPO / 'experiments/kolmogorov'))
del sys.modules['utils']

import utils as kolmogorov_utils  # noqa: E402

sys.path.pop(0)


def test_lorenz_factories_shapes():
    module = lorenz_utils.make_local_score(window=5, width=32, depth=2)
    params = lorenz_utils.init_score(module, window=5)

    out = module.apply({'params': params}, jnp.ones((4, 15)), jnp.ones((4,)))
    assert out.shape == (4, 15)

    module = lorenz_utils.make_global_score(hidden_channels=(8,), hidden_blocks=(1,))
    params = lorenz_utils.init_score(module)

    out = module.apply({'params': params}, jnp.ones((2, 3, 32)), jnp.ones((2,)))
    assert out.shape == (2, 3, 32)


def test_lorenz_log_prior_and_likelihood():
    chain = lorenz_utils.make_chain()
    x = chain.prior(jax.random.key(0), (8,))
    traj = chain.trajectory(jax.random.key(1), x, length=16)
    traj = jnp.moveaxis(traj, 0, 1)  # (8, 16, 3)

    lp = lorenz_utils.log_prior(traj)
    assert lp.shape == (8,)
    assert np.all(np.isfinite(np.asarray(lp)))

    y = traj[:, ::4, :1]
    ll = lorenz_utils.log_likelihood(y, traj, A=lambda x: x[..., :1], sigma=0.1, step=4)
    assert ll.shape == (8,)
    assert np.all(np.isfinite(np.asarray(ll)))


def test_lorenz_posterior_small():
    r"""BPF posterior wrapper on a tiny particle set: shapes and finiteness."""

    chain = lorenz_utils.make_chain()
    x_true = chain.prior(jax.random.key(0), ())
    traj = chain.trajectory(jax.random.key(1), x_true, length=17)

    A = lambda x: chain.preprocess(x)[..., :1]
    y = A(traj[::8])

    out = lorenz_utils.posterior(
        jax.random.key(2), y, A=A, sigma=0.1, step=8, particles=256
    )

    # bpf history: len(y) * step + 1 frames, first `step` dropped.
    assert out.shape[1] == len(y) * 8 + 1 - 8
    assert np.all(np.isfinite(np.asarray(out)))


def test_lorenz_weak_4d_var_improves_fit():
    chain = lorenz_utils.make_chain()
    x0 = chain.prior(jax.random.key(0), ())
    traj = chain.trajectory(jax.random.key(1), x0, length=16)  # (16, 3)

    y = traj[..., :1] + 0.05 * jax.random.normal(jax.random.key(2), traj[..., :1].shape)

    # Start from a perturbed trajectory; 4D-Var should pull it back.
    start = traj + 2.0 * jax.random.normal(jax.random.key(3), traj.shape)
    fit = lorenz_utils.weak_4d_var(start, y, A=lambda x: x[..., :1], sigma=0.05, iterations=60)

    err_before = float(jnp.mean((start[..., 0] - traj[..., 0]) ** 2))
    err_after = float(jnp.mean((fit[..., 0] - traj[..., 0]) ** 2))

    assert err_after < 0.1 * err_before


def test_kolmogorov_factories():
    module = kolmogorov_utils.make_score(
        window=3, embedding=8, hidden_channels=(8,), hidden_blocks=(1,), size=16
    )
    params = kolmogorov_utils.init_score(module)

    x = jnp.ones((2, 6, 16, 16))
    out = module.apply({'params': params}, x, jnp.ones((2,)))
    assert out.shape == (2, 6, 16, 16)

    eps = kolmogorov_utils.make_trajectory_eps(module, params, window=3)
    traj = jnp.ones((1, 7, 2, 16, 16))
    s = eps(traj, jnp.asarray(0.5))
    assert s.shape == traj.shape


def test_kolmogorov_viz_outputs():
    rgb = kolmogorov_utils.vorticity2rgb(np.random.randn(4, 16, 16))
    assert rgb.shape == (4, 16, 16, 3)
    assert rgb.dtype == np.uint8

    img = kolmogorov_utils.draw(np.random.randn(2, 3, 16, 16))
    assert img.size == (3 * 20 + 4, 2 * 20 + 4)

    img = kolmogorov_utils.sandwich(np.random.randn(3, 16, 16))
    assert img.size == (16 + 2 * 5, 16 + 2 * 5)


def test_load_score_dtype_override(tmp_path):
    r"""``load_score``'s compute dtype follows config.json unless explicitly
    overridden — a caller that always passed ``bf16=False`` would silently
    force f32 on the bf16-trained production runs (the `assimilate.py`
    --bf16/--f32 flags are tri-state for exactly this reason)."""

    from sda_tpu.train import save_params
    from sda_tpu.utils import save_config

    config = dict(
        window=3, embedding=8, hidden_channels=[8], hidden_blocks=[1],
        kernel_size=3, activation='SiLU', size=16, bf16=True,
    )
    runpath = tmp_path / 'unet_t'
    runpath.mkdir()
    save_config(config, runpath)

    module = kolmogorov_utils.make_score(**config)
    params = kolmogorov_utils.init_score(module)
    save_params(params, runpath / 'state.msgpack')

    # Default: follow config (bf16-trained run loads as bf16 compute).
    m_default, p_default, _ = kolmogorov_utils.load_score(runpath)
    assert m_default.dtype == jnp.bfloat16

    # Explicit overrides win in both directions.
    m_f32, _, _ = kolmogorov_utils.load_score(runpath, bf16=False)
    assert m_f32.dtype is None
    m_bf16, _, _ = kolmogorov_utils.load_score(runpath, bf16=True)
    assert m_bf16.dtype == jnp.bfloat16

    # Both compute dtypes run the same f32 params and agree to bf16 accuracy.
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    t = jnp.full((2,), 0.4)
    out32 = np.asarray(m_f32.apply({'params': p_default}, x, t))
    out16 = np.asarray(m_default.apply({'params': p_default}, x, t))
    np.testing.assert_allclose(out16, out32, atol=0.1 * np.abs(out32).max())
