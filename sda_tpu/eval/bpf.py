r"""Bootstrap particle filter — the ground-truth posterior sampler.

TPU-native re-design of reference ``sda/utils.py:168-202``: the observation
loop is a ``lax.scan``, transitions run batched over all particles, and
whole-history resampling uses ``jax.random.categorical`` over log-weights
(numerically safer than the reference's softmax + multinomial, same
distribution). Runs 2^14+ particles comfortably on a single chip.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def bpf(
    key: Array,
    x: Array,  # (M, *state)
    y: Array,  # (N, *obs)
    transition: Callable[[Array, Array], Array],
    log_likelihood: Callable[[Array, Array], Array],
    step: int = 1,
) -> Array:  # (M, N * step + 1, *state)
    r"""Samples :math:`p(x_{0:n} | y_{1:n})` with a bootstrap particle filter.

    Arguments:
        key: A PRNG key.
        x: The initial particle set :math:`x_0`.
        y: The observations :math:`(y_1, ..., y_n)`.
        transition: The transition sampler ``(key, x) -> x'``.
        log_likelihood: Per-particle **log**-weights ``(y_i, x_i) -> (M,)``
            (the reference takes already-normalized weights,
            ``sda/utils.py:198-199``; log-space is equivalent and stable).
        step: The number of transitions per observation.
    """

    m = x.shape[0]
    n = y.shape[0]
    total = n * step + 1

    history = jnp.zeros((m, total) + x.shape[1:], dtype=x.dtype)
    history = history.at[:, 0].set(x)

    keys = jax.random.split(key, n)

    def body(carry, inp):
        history, cur = carry
        i, yi, k = inp

        ks = jax.random.split(k, step + 1)

        for s in range(step):
            cur = transition(ks[s], cur)
            history = jax.lax.dynamic_update_slice_in_dim(
                history, cur[:, None], 1 + i * step + s, axis=1
            )

        logw = log_likelihood(yi, cur)
        j = jax.random.categorical(ks[-1], logw, shape=(m,))

        history = history[j]
        cur = cur[j]

        return (history, cur), None

    (history, _), _ = jax.lax.scan(
        body, (history, x), (jnp.arange(n), y, keys)
    )

    return history
