r"""Weak-constraint 4D-Var via L-BFGS — the classical variational baseline.

TPU-native re-design of reference ``experiments/lorenz/utils.py:126-147``
(torch LBFGS closure loop) using optax's L-BFGS with zoom line search; the
whole optimization runs on device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def lbfgs_minimize(
    fun: Callable[[Array], Array],
    x0: Array,
    iterations: int = 100,
) -> Array:
    r"""Minimizes a scalar function with L-BFGS (zoom line search).

    Arguments:
        fun: The objective.
        x0: The initial point (any pytree/array).
        iterations: The maximum number of updates.
    """

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry, _):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun
        )
        x = optax.apply_updates(x, updates)
        return (x, state), value

    (x, _), _ = jax.lax.scan(
        step, (x0, opt.init(x0)), None, length=iterations
    )

    return x


def weak_4d_var(
    x: Array,
    y: Array,
    log_prior: Callable[[Array], Array],
    log_likelihood: Callable[[Array, Array], Array],
    iterations: int = 100,
) -> Array:
    r"""Weak-constraint 4D-Var trajectory estimate.

    Objective parity with reference ``experiments/lorenz/utils.py:138-141``:

    .. math:: J(x) = \|x_0 - x_b\|^2 - \log p(x) - \log p(y | x)

    where :math:`x_b` is the (frozen) background initial state.

    Arguments:
        x: The initial trajectory guess ``(L, *state)``.
        y: The observations.
        log_prior: The dynamics log-density of a trajectory.
        log_likelihood: The observation log-density ``(y, x) -> scalar``.
        iterations: The number of L-BFGS updates.
    """

    x_b = jax.lax.stop_gradient(x[0])

    def objective(x):
        background = jnp.sum((x[0] - x_b) ** 2)
        return background - jnp.sum(log_prior(x)) - jnp.sum(log_likelihood(y, x))

    return lbfgs_minimize(objective, x, iterations)
