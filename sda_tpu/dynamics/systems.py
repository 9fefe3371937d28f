r"""Additional dynamical systems: damped spring and Lotka-Volterra.

TPU-native re-design of reference ``sda/mcs.py:60-82,214-241``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .markov import MarkovChain
from .ode import DiscreteODE

Array = jax.Array


class DampedSpring(MarkovChain):
    r"""Linearized dynamics of a mass on a spring subject to wind and drag —
    a linear-Gaussian chain with closed-form conditionals.

    Parity with reference ``sda/mcs.py:60-82``.
    """

    def __init__(self, dt: float = 0.01):
        super().__init__()

        self.mu_0 = jnp.array([1.0, 0.0, 0.0, 0.0])
        self.sigma_0 = jnp.eye(4)

        self.A = jnp.array([
            [1.0, dt, dt**2 / 2, 0.0],
            [0.0, 1.0, dt, 0.0],
            [-0.5, -0.1, 0.0, 0.2],
            [0.0, 0.0, 0.0, 0.99],
        ])
        self.b = jnp.zeros(4)
        self.sigma_x = jnp.diag(jnp.array([0.1, 0.1, 0.1, 1.0])) * dt

    def prior(self, key: Array, shape: Sequence[int] = ()) -> Array:
        return jax.random.multivariate_normal(
            key, self.mu_0, self.sigma_0, tuple(shape)
        )

    def transition(self, key: Array, x: Array) -> Array:
        mean = x @ self.A.T + self.b

        return jax.random.multivariate_normal(
            key, mean, self.sigma_x, mean.shape[:-1]
        )


class LotkaVolterra(DiscreteODE):
    r"""Log-space predator-prey dynamics.

    Parity with reference ``sda/mcs.py:214-241``.
    """

    def __init__(
        self,
        alpha: float = 1.0,
        beta: float = 1.0,
        delta: float = 1.0,
        gamma: float = 1.0,
        **kwargs,
    ):
        super().__init__(**kwargs)

        self.alpha, self.beta = alpha, beta
        self.delta, self.gamma = delta, gamma

    def prior(self, key: Array, shape: Sequence[int] = ()) -> Array:
        return jax.random.uniform(key, tuple(shape) + (2,))

    def f(self, x: Array) -> Array:
        return jnp.stack(
            (
                self.alpha - self.beta * jnp.exp(x[..., 1]),
                self.delta * jnp.exp(x[..., 0]) - self.gamma,
            ),
            axis=-1,
        )
