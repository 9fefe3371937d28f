r"""Lorenz dynamical systems (1963 and 1996).

TPU-native re-design of reference ``sda/mcs.py:125-211``: identical dynamics
and priors, expressed in jnp with explicit PRNG keys.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ode import DiscreteODE

Array = jax.Array


class Lorenz63(DiscreteODE):
    r"""Chaotic Lorenz 1963 dynamics.

    Parity with reference ``sda/mcs.py:125-172``: same drift, MVN prior over
    the attractor region, and per-dimension standardization constants.
    """

    #: Standardization constants (reference ``sda/mcs.py:160-172``).
    #: Host-side numpy on purpose: a class-level jnp.array would initialize
    #: the XLA backend at import time, which breaks
    #: :func:`sda_tpu.parallel.init_multihost` (the distributed runtime must
    #: come up before any backend touch).
    LOC = np.array([0.0, 0.0, 25.0], dtype=np.float32)
    SCALE = np.array([8.0, 9.0, 8.6], dtype=np.float32)

    def __init__(
        self,
        sigma: float = 10.0,
        rho: float = 28.0,
        beta: float = 8 / 3,
        **kwargs,
    ):
        super().__init__(**kwargs)

        self.sigma, self.rho, self.beta = sigma, rho, beta

    def prior(self, key: Array, shape: Sequence[int] = ()) -> Array:
        mean = jnp.array([0.0, 0.0, 25.0])
        cov = jnp.array([
            [64.0, 50.0, 0.0],
            [50.0, 81.0, 0.0],
            [0.0, 0.0, 75.0],
        ])

        return jax.random.multivariate_normal(key, mean, cov, tuple(shape))

    def f(self, x: Array) -> Array:
        return jnp.stack(
            (
                self.sigma * (x[..., 1] - x[..., 0]),
                x[..., 0] * (self.rho - x[..., 2]) - x[..., 1],
                x[..., 0] * x[..., 1] - self.beta * x[..., 2],
            ),
            axis=-1,
        )

    @classmethod
    def preprocess(cls, x: Array) -> Array:
        r"""Standardizes states for training."""

        return (x - cls.LOC) / cls.SCALE

    @classmethod
    def postprocess(cls, x: Array) -> Array:
        r"""Un-standardizes network-space states."""

        return cls.LOC + cls.SCALE * x


class NoisyLorenz63(Lorenz63):
    r"""Lorenz 1963 dynamics with Gaussian transition noise.

    Parity with reference ``sda/mcs.py:175-185``: noise scale
    :math:`\sqrt{dt}`; :meth:`log_prob` is the exact transition
    log-likelihood used as the physics-consistency metric.
    """

    def moments(self, x: Array) -> Tuple[Array, Array]:
        mean = super().transition(None, x)
        return mean, jnp.asarray(self.dt**0.5)

    def transition(self, key: Array, x: Array) -> Array:
        mean, std = self.moments(x)
        return mean + std * jax.random.normal(key, x.shape, dtype=x.dtype)

    def log_prob(self, x1: Array, x2: Array) -> Array:
        r"""Exact :math:`\log p(x_2 | x_1)`, summed over state dimensions."""

        mean, std = self.moments(x1)
        log_p = jax.scipy.stats.norm.logpdf(x2, mean, std)

        return jnp.sum(log_p, axis=-1)


class Lorenz96(DiscreteODE):
    r"""Lorenz 1996 cyclic lattice dynamics.

    Parity with reference ``sda/mcs.py:188-211``.

    Arguments:
        n: The number of lattice sites.
        F: The forcing constant.
    """

    def __init__(self, n: int = 32, F: float = 16.0, **kwargs):
        super().__init__(**kwargs)

        self.n, self.F = n, F

    def prior(self, key: Array, shape: Sequence[int] = ()) -> Array:
        return jax.random.normal(key, tuple(shape) + (self.n,))

    def f(self, x: Array) -> Array:
        x1 = jnp.roll(x, 1, axis=-1)
        x2 = jnp.roll(x, -2, axis=-1)
        x3 = jnp.roll(x, -1, axis=-1)

        return (x1 - x2) * x3 - x + self.F
