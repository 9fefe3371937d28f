r"""Windowed Markov-blanket score decomposition — the SDA algorithm core.

TPU-native re-design of reference ``sda/score.py:96-164``. A kernel trained on
windows of ``2k+1`` states scores trajectories of *any* length ``L`` by
evaluating all ``L - 2k`` sliding windows in one batched call and recombining:
the first window contributes its leading ``k`` rows, every window its center
row, and the last window its trailing ``k`` rows.

``unfold``/``fold`` are pure jnp functions (static Python loop over the small
window size — fully unrolled under ``jit``); :class:`MCScoreNet` composes any
window-kernel eps function into a full-trajectory eps function, and
:class:`MCScoreWrapper` reuses a spatial score network with time-as-space for
the "global" baseline.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array
EpsFn = Callable[..., Array]


def unfold(x: Array, order: int) -> Array:
    r"""Extracts all sliding windows of size ``2*order + 1`` along axis 1 and
    merges each window into the channel axis.

    ``(B, L, C, *spatial) -> (B, L - 2*order, (2*order + 1) * C, *spatial)``

    with frame-major channel order (frame 0's channels first), matching
    reference ``sda/score.py:146-153``.
    """

    k = 2 * order + 1
    length = x.shape[1] - k + 1

    windows = jnp.stack(
        [jax.lax.slice_in_dim(x, i, i + length, axis=1) for i in range(k)],
        axis=2,
    )  # (B, L', k, C, *spatial)

    return windows.reshape(
        windows.shape[:2] + (k * x.shape[2],) + windows.shape[4:]
    )


def fold(x: Array, order: int) -> Array:
    r"""Reassembles a length-``L`` sequence from window scores.

    Inverse recombination of :func:`unfold` (reference ``sda/score.py:155-164``):
    first window's leading ``order`` frames + every window's center frame +
    last window's trailing ``order`` frames.

    ``(B, L', (2*order + 1) * C, *spatial) -> (B, L' + 2*order, C, *spatial)``
    """

    k = 2 * order + 1
    x = x.reshape(x.shape[:2] + (k, x.shape[2] // k) + x.shape[3:])

    return jnp.concatenate(
        (
            x[:, 0, :order],
            x[:, :, order],
            x[:, -1, k - order:],
        ),
        axis=1,
    )


def chunked_eval(
    kernel: EpsFn,
    x: Array,
    t: Array,
    c: Optional[Array],
    chunk: int,
    remat: bool = False,
) -> Array:
    r"""Evaluates ``kernel`` over the window axis in sequential chunks.

    ``x`` is an *unfolded* batch of windows ``(B, n_windows, (2k+1) C,
    *spatial)``. Windows are padded up to a multiple of ``chunk`` (the pad
    windows' outputs are discarded), reshaped to ``(num_chunks, B, chunk,
    ...)`` and scanned with ``lax.map`` — peak activation memory scales with
    ``chunk`` instead of ``n_windows``. With ``remat=True`` each chunk's
    kernel evaluation is wrapped in ``jax.checkpoint`` so a VJP through this
    path (guided sampling) recomputes one chunk at a time instead of
    stacking every chunk's residuals.

    Shared by :class:`MCScoreNet` and
    :class:`~sda_tpu.parallel.ShardedMCScoreNet` (the sequence-parallel
    variant applies it within each sequence shard).
    """

    batch, n_windows = x.shape[:2]
    chunk = min(chunk, n_windows)
    pad = (-n_windows) % chunk

    if pad:
        x = jnp.concatenate(
            (x, jnp.repeat(x[:, -1:], pad, axis=1)), axis=1
        )

    num_chunks = x.shape[1] // chunk

    x = x.reshape((batch, num_chunks, chunk) + x.shape[2:])
    x = jnp.moveaxis(x, 1, 0)  # (num_chunks, B, chunk, ...)

    fn = lambda xc: kernel(xc, t, c)
    if remat:
        fn = jax.checkpoint(fn)
    s = jax.lax.map(fn, x)

    s = jnp.moveaxis(s, 0, 1).reshape(
        (batch, num_chunks * chunk) + s.shape[3:]
    )

    return s[:, :n_windows]


class MCScoreNet:
    r"""Composes a window-kernel eps function into a trajectory eps function.

    The counterpart of reference ``sda/score.py:113-144``, expressed as a
    function transform: given ``kernel(x, t, c)`` operating on events of shape
    ``((2*order + 1) * C, *spatial)``, the composed callable scores full
    ``(B, L, C, *spatial)`` trajectories. Composes into
    :meth:`VPSDE.sample` and :class:`GaussianScore` unchanged — the unfolded
    batch of windows is one large MXU-friendly network evaluation, and
    ``jax.grad`` flows through unfold/kernel/fold for guided sampling.

    Arguments:
        kernel: The window eps function.
        order: The Markov order ``k`` (window size is ``2k + 1``).
        chunk: Optional window-chunk size. When set, windows are evaluated in
            sequential chunks via ``lax.map`` (memory-optimal long-trajectory
            mode: peak activation memory scales with ``chunk`` instead of
            ``L``, trading wall-clock for HBM — the scaling lever for
            127-frame 256^2 trajectories, SURVEY.md §5).
        remat: Rematerialize each chunk's kernel evaluation
            (``jax.checkpoint`` *inside* the ``lax.map``). Without this, a
            VJP through the chunked path — guided sampling — stacks every
            chunk's kernel activations as scan residuals, so chunking only
            bounds the forward peak; with it, the backward pass recomputes
            one chunk at a time and total activation memory really is
            O(chunk). Implied by guidance when differentiating through a
            chunked score (``GaussianScore(remat=True)`` alone checkpoints
            only the outer call, which does not bound the inner map's
            residuals).
    """

    def __init__(
        self,
        kernel: EpsFn,
        order: int,
        chunk: Optional[int] = None,
        remat: bool = False,
    ):
        self.kernel = kernel
        self.order = order
        self.chunk = chunk
        self.remat = remat

    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        x = unfold(x, self.order)

        if self.chunk is None:
            s = self.kernel(x, t, c)
        else:
            s = self._chunked_kernel(x, t, c)

        s = fold(s, self.order)

        return s

    def _chunked_kernel(self, x: Array, t: Array, c: Optional[Array]) -> Array:
        return chunked_eval(self.kernel, x, t, c, self.chunk, self.remat)


class MCScoreWrapper:
    r"""Disguises a spatial score network as a Markov-chain score network by
    treating time as an extra spatial axis.

    ``(B, L, C, *spatial)`` is transposed to ``(B, C, L, *spatial)`` around the
    wrapped network (reference ``sda/score.py:96-110``) — e.g. a 1-D
    ``ScoreUNet`` over channels ``C`` with the trajectory length as its
    spatial extent ("global" baseline).
    """

    def __init__(self, score: EpsFn):
        self.score = score

    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        y = jnp.swapaxes(x, 1, 2)
        y = self.score(y, t, c)

        return jnp.swapaxes(y, 1, 2)
