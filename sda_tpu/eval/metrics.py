r"""Distribution metrics: Wasserstein/EMD and MMD.

TPU-native re-design of reference ``sda/utils.py:205-263``. The reference
delegates exact EMD to POT's C++ network-simplex solver; here:

- :func:`emd` — **exact** W1 transport cost. For equal-size sample sets with
  uniform weights (the only case the reference exercises: 1024 vs 1024 at
  ``experiments/lorenz/eval.py:63,89``) the optimal plan is an assignment,
  solved exactly with scipy's Jonker-Volgenant LAP on host; the pairwise
  distance matrix is computed on device.
- :func:`sinkhorn` — entropy-regularized OT fully on device (jit/vmap
  friendly), for large or unequal-count sample sets where the exact
  assignment does not apply. Production call site: the Kolmogorov
  Wasserstein gate (``experiments/kolmogorov/eval.py:wasserstein_gate``,
  generated vs test frames with unequal counts, calibrated by the
  test-vs-test split floor).
- :func:`mmd` — multi-scale RBF-kernel MMD, direct jnp port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pairwise_distances(x: Array, y: Array) -> Array:
    r"""Euclidean distance matrix between flattened sample sets."""

    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)

    sq = (
        jnp.sum(x**2, axis=1)[:, None]
        + jnp.sum(y**2, axis=1)[None, :]
        - 2 * x @ y.T
    )

    return jnp.sqrt(jnp.maximum(sq, 0.0))


def emd(x: Array, y: Array) -> float:
    r"""Exact earth mover's distance between two sample sets.

    Parity with reference ``sda/utils.py:205-223`` (``ot.emd2`` with uniform
    weights): returns the mean transport cost under the optimal plan.
    Requires equal sample counts (the optimal uniform-marginal plan is then a
    permutation — Birkhoff); use :func:`sinkhorn` otherwise.
    """

    from scipy.optimize import linear_sum_assignment

    if x.shape[0] != y.shape[0]:
        raise ValueError(
            'exact emd requires equal sample counts; use sinkhorn instead'
        )

    cost = np.asarray(pairwise_distances(x, y))

    if not np.all(np.isfinite(cost)):
        # Degenerate samples (diverged model, inf/nan states): the distance
        # is undefined — report nan rather than crashing an eval sweep.
        return float('nan')

    rows, cols = linear_sum_assignment(cost)

    return float(cost[rows, cols].mean())


def sinkhorn(
    x: Array,
    y: Array,
    reg: float = 0.01,
    iterations: int = 200,
) -> Array:
    r"""Entropy-regularized OT cost, fully on device (log-domain Sinkhorn).

    Converges to :func:`emd` as ``reg -> 0``. The returned value is the
    transport cost ``<P, C>`` under the regularized plan (no entropy term),
    so it upper-bounds W1 with an O(reg log n) bias.
    """

    cost = pairwise_distances(x, y)
    m, n = cost.shape

    log_mu = jnp.full((m,), -jnp.log(m))
    log_nu = jnp.full((n,), -jnp.log(n))

    def body(carry, _):
        f, g = carry
        # Log-domain updates: f_i = -reg * logsumexp((g_j - C_ij)/reg + log_nu_j)
        f = -reg * jax.scipy.special.logsumexp(
            (g[None, :] - cost) / reg + log_nu[None, :], axis=1
        )
        g = -reg * jax.scipy.special.logsumexp(
            (f[:, None] - cost) / reg + log_mu[:, None], axis=0
        )
        return (f, g), None

    f = jnp.zeros((m,))
    g = jnp.zeros((n,))
    (f, g), _ = jax.lax.scan(body, (f, g), None, length=iterations)

    log_plan = (
        (f[:, None] + g[None, :] - cost) / reg
        + log_mu[:, None]
        + log_nu[None, :]
    )

    return jnp.sum(jnp.exp(log_plan) * cost)


def mmd(x: Array, y: Array) -> Array:
    r"""Empirical maximum mean discrepancy with a multi-scale RBF kernel.

    Parity with reference ``sda/utils.py:226-263``: squared-distance kernels
    ``exp(-d^2 / sigma)`` summed over ``sigma in 1e-3..1e3``.
    """

    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)

    xx = x @ x.T
    yy = y @ y.T
    xy = x @ y.T

    dxx = jnp.diag(xx)[:, None]
    dyy = jnp.diag(yy)[None, :]

    err_xx = dxx + dxx.T - 2 * xx
    err_yy = dyy + dyy.T - 2 * yy
    err_xy = dxx + dyy - 2 * xy

    total = 0.0

    for sigma in (1e-3, 1e-2, 1e-1, 1e0, 1e1, 1e2, 1e3):
        total = total + (
            jnp.mean(jnp.exp(-err_xx / sigma))
            + jnp.mean(jnp.exp(-err_yy / sigma))
            - 2 * jnp.mean(jnp.exp(-err_xy / sigma))
        )

    return total
