r"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-backend trick (see SURVEY.md §4): multi-device
sharding logic is exercised on host CPU devices, so the suite runs anywhere
and the TPU is reserved for benchmarks.

Note: the environment may import jax at interpreter startup (sitecustomize)
with a TPU platform pinned via ``JAX_PLATFORMS``, so plain env vars are too
late here — ``jax.config.update`` is the reliable override.
"""

import os

# Must precede backend initialization (not merely jax import).
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

assert jax.devices()[0].platform == 'cpu', 'tests must run on the CPU backend'
