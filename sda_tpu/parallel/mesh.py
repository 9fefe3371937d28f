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


# -- Multi-host (DCN) scale-out ----------------------------------------------

def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    r"""Initializes the multi-controller runtime for multi-host scale-out.

    The reference scales out with Slurm job arrays (SURVEY.md §5 — one
    process per independent job, no cross-job communication); here multiple
    hosts run ONE SPMD program: every process calls this, builds the same
    global :func:`make_mesh` over ``jax.devices()`` (which then spans all
    hosts), and jitted programs shard/psum across the data-center network
    exactly as they do across ICI on one host.

    Call this FIRST — before any computation, ``jax.devices()``, or
    ``device_put`` (``import sda_tpu`` itself is deliberately backend-free
    so the documented ``from sda_tpu.parallel import init_multihost`` path
    works).

    Arguments:
        coordinator_address: ``host:port`` of process 0.
        num_processes: Total number of participating processes.
        process_id: This process's rank in ``[0, num_processes)``.
    """

    from jax._src import xla_bridge

    if xla_bridge._backends:
        raise RuntimeError(
            'init_multihost must run before anything touches the XLA '
            'backend (jax.devices(), device_put, any computation — or '
            'creating a jnp array at import time). Move the '
            'init_multihost(...) call to the top of the program.'
        )

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_sharded_array(local_part, mesh: Mesh, axis: str = 'dp'):
    r"""Assembles a global array from per-process shards (leading axis).

    Each host feeds only its own slice (e.g. its shard of a dataset too
    large for one host); the returned global ``jax.Array`` is sharded over
    ``axis`` and usable directly as a jit argument. Counterpart of
    :func:`shard_batch` for the multi-controller case, where
    ``jax.device_put`` cannot address other hosts' devices.

    Arguments:
        local_part: This process's slice of the leading axis (same shape on
            every process).
        mesh: A global mesh whose ``axis`` spans all processes.
        axis: The mesh axis to shard the leading array axis over.
    """

    local_part = np.asarray(local_part)
    spec = P(axis, *([None] * (local_part.ndim - 1)))
    global_shape = (
        local_part.shape[0] * jax.process_count(),
    ) + local_part.shape[1:]

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_part, global_shape
    )
