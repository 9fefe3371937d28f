r"""Device-mesh helpers for SPMD training and sampling.

The reference has no distributed backend at all (SURVEY.md §5: scale-out is
Slurm job arrays). Here scale-out is a single JAX program over a
``jax.sharding.Mesh``: data parallelism over the batch axis, tensor
parallelism over network channels, and sequence/window parallelism over the
trajectory axis, with XLA inserting the collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    r"""Builds a device mesh.

    Arguments:
        axes: Mapping axis name -> size. A size of ``-1`` absorbs the
            remaining devices. Defaults to a pure data-parallel mesh
            ``{'dp': n_devices}``.
        devices: The devices to use (defaults to all).
    """

    if devices is None:
        devices = jax.devices()

    n = len(devices)

    if axes is None:
        axes = {'dp': n}

    names = list(axes.keys())
    sizes = list(axes.values())

    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known

    need = int(np.prod(sizes))
    assert need <= n, (
        f'mesh {dict(zip(names, sizes))} needs {need} devices, have {n}'
    )

    # A smaller mesh (e.g. --mesh sp=4 on an 8-device host) takes the first
    # `need` devices.
    devices = list(devices)[:need]

    mesh_devices = mesh_utils.create_device_mesh(sizes, devices=devices)

    return Mesh(mesh_devices, axis_names=tuple(names))


def shard_batch(x, mesh: Mesh, axis: str = 'dp'):
    r"""Places an array with its leading axis sharded over ``axis``."""

    spec = P(axis, *([None] * (x.ndim - 1)))

    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    r"""Places a pytree fully replicated over the mesh."""

    sharding = NamedSharding(mesh, P())

    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)


def batch_constraint(x, mesh: Mesh, axis: str = 'dp'):
    r"""Annotates (inside jit) that ``x`` is sharded over its leading axis."""

    spec = P(axis, *([None] * (x.ndim - 1)))

    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
