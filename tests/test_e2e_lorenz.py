r"""End-to-end Lorenz slice (SURVEY.md §7 minimum slice, CPU-scaled).

Generate standardized trajectories -> train the local window kernel with the
VPSDE loss -> unconditionally sample and check physics log-prob improves over
noise -> zero-shot assimilate partial observations and check the residual and
posterior contraction. Sizes are scaled down for the 1-core CI box; the
experiment scripts run the full-size version.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.diffusion import GaussianScore, MCScoreNet, ScoreNet, VPSDE, bind_eps
from sda_tpu.dynamics import NoisyLorenz63
from sda_tpu.train import TrajectoryDataset, Trainer


WINDOW = 5
LENGTH = 33


@pytest.fixture(scope='module')
def trained():
    r"""Generates a small dataset and trains the local kernel briefly."""

    chain = NoisyLorenz63(dt=0.025)
    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    x = chain.prior(k1, (512,))
    x = chain.trajectory(k2, x, length=512, last=True)
    x = chain.trajectory(k3, x, length=256)  # (256, 512, 3)
    x = chain.preprocess(x)
    data = np.asarray(x).transpose(1, 0, 2)  # (512, 256, 3)

    trainset = TrajectoryDataset(data[:448], window=WINDOW, flatten=True)
    validset = TrajectoryDataset(data[448:], window=WINDOW, flatten=True)

    module = ScoreNet(
        features=WINDOW * 3,
        embedding=32,
        hidden_features=(256,) * 3,
        activation=jax.nn.silu,
    )
    params = module.init(
        k4, jnp.zeros((1, WINDOW * 3)), jnp.ones((1,))
    )['params']

    sde = VPSDE(shape=(WINDOW * 3,))
    trainer = Trainer(
        sde, module, params, trainset, validset,
        epochs=2048, batch_size=64, learning_rate=1e-3,
        scheduler='linear', key=k5,
    )

    stats = [trainer.step_epoch() for _ in range(2048)]

    return chain, module, trainer.params, stats


def test_training_converges(trained):
    _, _, _, stats = trained

    first = np.mean([s['loss_train'] for s in stats[:20]])
    last = np.mean([s['loss_train'] for s in stats[-20:]])

    assert last < 0.5 * first


def test_unconditional_samples_respect_dynamics(trained):
    chain, module, params, _ = trained

    eps = bind_eps(module, params)
    sde = VPSDE(eps=eps, shape=(WINDOW * 3,))

    x = sde.sample(jax.random.key(10), (512,), steps=64)
    x = x.reshape(512, WINDOW, 3)
    x = chain.postprocess(x)

    log_p = float(jnp.mean(chain.log_prob(x[:, :-1], x[:, 1:])))

    # Independent noise trajectories score catastrophically; trained samples
    # must be within a few nats/transition of the data.
    noise = chain.postprocess(jax.random.normal(jax.random.key(11), (512, WINDOW, 3)))
    log_p_noise = float(jnp.mean(chain.log_prob(noise[:, :-1], noise[:, 1:])))

    assert log_p > log_p_noise + 100
    assert log_p > -10.0


def test_zero_shot_assimilation(trained):
    r"""Assimilate observations of the first coordinate every 4 frames; the
    guided posterior must (a) reproduce the observations to within a few
    noise stds, (b) beat the unconditional samples at matching them."""

    chain, module, params, _ = trained

    # Ground-truth trajectory + observations (standardized space).
    k1, k2, k3, k4 = jax.random.split(jax.random.key(20), 4)
    x_true = chain.prior(k1, ())
    x_true = chain.trajectory(k2, x_true, length=256, last=True)
    traj = chain.trajectory(k3, x_true, length=LENGTH)  # (L, 3)
    traj_std = chain.preprocess(traj)

    obs_std = 0.1
    step = 4
    y = traj_std[::step, :1] + obs_std * jax.random.normal(
        k4, traj_std[::step, :1].shape
    )

    score = MCScoreNet(bind_eps(module, params), order=WINDOW // 2)

    sde = VPSDE(
        eps=GaussianScore(
            y=y,
            A=lambda x: x[..., ::step, :1],
            std=obs_std,
            sde=VPSDE(eps=score, shape=()),
            gamma=1e-2,
        ),
        shape=(LENGTH, 3),
    )

    xs = sde.sample(jax.random.key(21), (64,), steps=128, corrections=1, tau=0.25)

    # (a) Posterior consistency: residual std close to the observation noise
    # (the notebook sanity check, reference figures.ipynb cells 11/18/25).
    residual = np.asarray(xs[:, ::step, :1] - y)
    assert np.sqrt(np.mean(residual**2)) < 5 * obs_std

    # (b) The guided samples track the truth far better than prior samples.
    prior_xs = VPSDE(eps=score, shape=(LENGTH, 3)).sample(
        jax.random.key(22), (64,), steps=128
    )

    err_guided = float(jnp.mean((xs[..., ::step, 0] - traj_std[::step, 0]) ** 2))
    err_prior = float(jnp.mean((prior_xs[..., ::step, 0] - traj_std[::step, 0]) ** 2))

    assert err_guided < 0.25 * err_prior
