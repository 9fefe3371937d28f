r"""Sequence-parallel windowed scoring: shard the trajectory axis over the
mesh with k-frame halo exchange between neighbor devices.

The reference's long-trajectory mechanism is purely algorithmic — one big
batched window evaluation (SURVEY.md §5). On TPU the window axis is a
natural sharding axis: each device scores a contiguous chunk of windows and
only ``order``-frame halos move over ICI (``ppermute``), the ring/context-
parallel analog for this workload. Results are numerically identical to the
unsharded :class:`~sda_tpu.diffusion.windowed.MCScoreNet` because the window
kernel is per-window independent.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..diffusion.windowed import chunked_eval, unfold

Array = jax.Array


class ShardedMCScoreNet:
    r"""Trajectory eps function sharded along the sequence axis.

    Arguments:
        kernel: The window eps function (events ``((2k+1) C, *spatial)``).
        order: The Markov order ``k``.
        mesh: The device mesh.
        axis: The mesh axis to shard the trajectory over.
        chunk: Optional window-chunk size *within each sequence shard* —
            the per-shard analog of ``MCScoreNet(chunk=...)``: each device
            evaluates its windows in sequential chunks via ``lax.map`` so
            peak activation memory per device scales with ``chunk``, not
            with the shard length. This composes the two scale levers
            (sequence sharding over ICI + chunked evaluation within the
            shard) for trajectories that exceed one chip's HBM even after
            sharding (SURVEY.md §7 hard part 4: 256^2 long trajectories).
        remat: Rematerialize each chunk's kernel evaluation inside the
            ``lax.map`` (required for the VJP through a chunked path to
            stay O(chunk) in memory — same semantics as
            ``MCScoreNet(remat=True)``).

    Constraints: the trajectory length ``L`` must divide by the axis size,
    and each shard must hold at least ``2k + 1`` frames.
    """

    def __init__(
        self,
        kernel: Callable,
        order: int,
        mesh: Mesh,
        axis: str = 'sp',
        chunk: Optional[int] = None,
        remat: bool = False,
    ):
        self.kernel = kernel
        self.order = order
        self.mesh = mesh
        self.axis = axis
        self.chunk = chunk
        self.remat = remat

    def __call__(self, x: Array, t: Array, c: Optional[Array] = None) -> Array:
        k = self.order
        axis = self.axis
        n_shards = self.mesh.shape[axis]
        kernel = self.kernel

        length = x.shape[1]
        assert length % n_shards == 0, (
            f'trajectory length {length} must divide over {n_shards} shards'
        )
        chunk = length // n_shards
        assert chunk >= 2 * k + 1, (
            f'chunk length {chunk} must hold a full window (2k+1 = {2 * k + 1})'
        )

        def local_score(x_loc: Array, t: Array, c: Optional[Array]) -> Array:
            # x_loc: (B, chunk, C, *spatial) on each device.
            p = jax.lax.axis_index(axis)

            right_shift = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            left_shift = [(i, (i - 1) % n_shards) for i in range(n_shards)]

            # Halo exchange over ICI: each device receives its left
            # neighbor's trailing k frames and right neighbor's leading k.
            left_halo = jax.lax.ppermute(x_loc[:, -k:], axis, right_shift)
            right_halo = jax.lax.ppermute(x_loc[:, :k], axis, left_shift)

            ext = jnp.concatenate((left_halo, x_loc, right_halo), axis=1)

            # chunk windows, window i centered at local frame i. Windows that
            # read wrapped-around halo garbage (only at the global sequence
            # ends) are computed but masked out below.
            windows = unfold(ext, k)
            if self.chunk is None:
                s = kernel(windows, t, c)
            else:
                s = chunked_eval(kernel, windows, t, c, self.chunk, self.remat)
            s = s.reshape(s.shape[:2] + (2 * k + 1, -1) + s.shape[3:])

            center = s[:, :, k]  # (B, chunk, C, *spatial)

            # Global sequence ends follow the fold() edge rule
            # (reference sda/score.py:155-164): leading k frames from the
            # first full window, trailing k from the last.
            lead = s[:, k, :k]  # rows 0..k-1 of window k
            tail = s[:, chunk - 1 - k, k + 1:]  # rows k+1..2k

            is_first = (p == 0)
            is_last = (p == n_shards - 1)

            out = center
            out = out.at[:, :k].set(
                jnp.where(is_first, lead, center[:, :k])
            )
            out = out.at[:, -k:].set(
                jnp.where(is_last, tail, center[:, -k:])
            )

            return out

        # The context is replicated on every shard (reference semantics:
        # ``c`` is broadcast to all windows, ``sda/score.py:87``). It rides
        # through ``shard_map`` as an explicit argument — ``None`` is an
        # empty pytree, so the same ``P()`` spec covers both cases.
        spec = P(None, self.axis, *([None] * (x.ndim - 2)))

        sharded = jax.shard_map(
            local_score,
            mesh=self.mesh,
            in_specs=(spec, P(), P()),
            out_specs=spec,
            check_vma=False,
        )

        return sharded(x, jnp.asarray(t), c)
