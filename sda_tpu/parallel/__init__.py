r"""SPMD helpers: meshes, shardings, collectives."""

from .mesh import batch_constraint, make_mesh, replicate, shard_batch  # noqa: F401
from .windowed import ShardedMCScoreNet  # noqa: F401
