r"""Trajectory datasets: HDF5 I/O and device-resident windowed batching.

TPU-native re-design of reference ``sda/utils.py:58-86``. The reference pulls
the whole HDF5 array to host RAM and serves per-item random temporal crops
through a torch DataLoader (host->GPU copy per batch); here the whole dataset
lives in device HBM (optionally sharded over a mesh) and random window crops
happen *inside* the jitted epoch — no host round-trips during training.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def save_h5(path: Path, x: np.ndarray) -> None:
    r"""Writes a trajectory array to HDF5 under key ``'x'`` (reference format:
    ``experiments/lorenz/generate.py:29-32``)."""

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    with h5py.File(path, mode='w') as f:
        f.create_dataset('x', data=np.asarray(x), dtype=np.float32)


def load_h5(path: Path) -> np.ndarray:
    r"""Reads the trajectory array ``'x'`` from HDF5."""

    with h5py.File(path, mode='r') as f:
        return f['x'][:]


class TrajectoryDataset:
    r"""Device-resident trajectory dataset.

    Arguments:
        data: The trajectories ``(N, L, C, *spatial)`` (array or HDF5 path).
        window: The temporal crop length (``None`` keeps full trajectories).
        flatten: Whether to merge ``(window, C) -> (window * C,)`` per item
            (the layout the window kernel is trained on, reference
            ``sda/utils.py:83-84``).
    """

    def __init__(
        self,
        data,
        window: Optional[int] = None,
        flatten: bool = False,
    ):
        if isinstance(data, (str, Path)):
            data = load_h5(data)

        self.data = jnp.asarray(data, dtype=jnp.float32)
        self.window = window
        self.flatten = flatten

    def __len__(self) -> int:
        return self.data.shape[0]

    @property
    def length(self) -> int:
        return self.data.shape[1]

    def crop(self, key: Array, x: Array) -> Array:
        r"""Random temporal crop of a batch ``(B, L, C, *spatial)`` to
        ``(B, window, C, *spatial)`` — one independent start per item,
        executed on device inside the jitted train step."""

        if self.window is None:
            return x

        starts = jax.random.randint(
            key, (x.shape[0],), 0, x.shape[1] - self.window + 1
        )

        def take(xi, s):
            return jax.lax.dynamic_slice_in_dim(xi, s, self.window, axis=0)

        x = jax.vmap(take)(x, starts)

        if self.flatten:
            x = x.reshape(x.shape[:1] + (-1,) + x.shape[3:])

        return x

    def epoch_batches(
        self,
        key: Array,
        batch_size: int,
    ) -> Tuple[Array, int]:
        r"""Returns a shuffled index matrix ``(num_batches, batch_size)`` for
        one epoch. The remainder (``N mod batch_size`` items) is dropped —
        with per-epoch reshuffling every item is seen in expectation. If the
        dataset is smaller than ``batch_size``, one full-dataset batch is
        used instead."""

        n = len(self)
        batch_size = min(batch_size, n)
        num_batches = n // batch_size

        perm = jax.random.permutation(key, n)
        idx = perm[: num_batches * batch_size].reshape(num_batches, batch_size)

        return idx, num_batches
