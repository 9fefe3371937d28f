r"""Markov-chain core: priors, transitions, and `lax.scan` rollouts.

TPU-native re-design of reference ``sda/mcs.py:22-57``. The reference rolls
out trajectories with a Python-level loop (one kernel launch per step); here
rollouts compile to a single ``jax.lax.scan`` program, with explicit PRNG
keys for stochastic transitions. Deterministic systems simply ignore the key.
"""

from __future__ import annotations

import abc
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


class MarkovChain(abc.ABC):
    r"""Abstract first-order time-invariant Markov chain."""

    @abc.abstractmethod
    def prior(self, key: Array, shape: Sequence[int] = ()) -> Array:
        r"""Samples :math:`x_0 \sim p(x_0)`."""

    @abc.abstractmethod
    def transition(self, key: Array, x: Array) -> Array:
        r"""Samples :math:`x_i \sim p(x_i | x_{i-1})`."""

    def trajectory(
        self,
        key: Array,
        x: Array,
        length: int,
        last: bool = False,
    ) -> Array:
        r"""Rolls out :math:`(x_1, ..., x_n) \sim \prod_i p(x_i | x_{i-1})`.

        A single scanned program (vs. the reference's Python loop at
        ``sda/mcs.py:42-57``). Returns the full time-major stack
        ``(length, *x.shape)``, or only the final state if ``last=True``.
        """

        keys = jax.random.split(key, length)

        if last:

            def step(x, key):
                return self.transition(key, x), None

            x, _ = jax.lax.scan(step, x, keys)
            return x
        else:

            def step(x, key):
                x = self.transition(key, x)
                return x, x

            _, xs = jax.lax.scan(step, x, keys)
            return xs
