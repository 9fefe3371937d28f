r"""Shared helpers: broadcasting, configs, activation registry.

TPU-native re-design of the reference's helper layer. Replaces
``zuko.utils.broadcast`` (used at reference ``sda/score.py:10``) and the
config/activation registry in reference ``sda/utils.py:19-42``.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp


Array = jax.Array


#: Name -> elementwise activation. Mirrors the registry at reference
#: ``sda/utils.py:19-25`` so config files stay interchangeable.
ACTIVATIONS: Dict[str, Callable[[Array], Array]] = {
    'ReLU': jax.nn.relu,
    'ELU': jax.nn.elu,
    'GELU': jax.nn.gelu,
    'SELU': jax.nn.selu,
    'SiLU': jax.nn.silu,
}


def broadcast(*arrays: Array, ignore: int = 0) -> tuple:
    r"""Broadcasts arrays to a common shape, ignoring the last ``ignore`` axes.

    Functional equivalent of ``zuko.utils.broadcast`` as used by the reference
    score networks (``sda/score.py:57,60,87``): the trailing ``ignore`` axes of
    each array are treated as event axes and left untouched, while the leading
    (batch) axes are broadcast together.
    """

    if ignore > 0:
        dims = [a.shape[:-ignore] for a in arrays]
        tails = [a.shape[-ignore:] for a in arrays]
    else:
        dims = [a.shape for a in arrays]
        tails = [() for _ in arrays]

    common = jnp.broadcast_shapes(*dims)

    return tuple(
        jnp.broadcast_to(a, common + tail)
        for a, tail in zip(arrays, tails)
    )


def enable_compilation_cache(path: str = '/tmp/sda_tpu_jax_cache') -> None:
    r"""Turns on JAX's persistent compilation cache (first compile of the big
    scanned programs is minutes on some TPU runtimes; repeats become
    instant). Safe to call multiple times; failures are non-fatal."""

    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


class profile_trace:
    r"""Context manager around ``jax.profiler`` tracing (the reference has no
    profiling at all — SURVEY.md §5). Produces a TensorBoard-compatible trace
    directory; failures (unsupported runtime) are non-fatal.

    >>> with profile_trace('/tmp/trace'):
    ...     step(...)
    """

    def __init__(self, path: str):
        self.path = str(path)
        self.active = False

    def __enter__(self):
        try:
            jax.profiler.start_trace(self.path)
            self.active = True
        except Exception:
            self.active = False
        return self

    def __exit__(self, *exc):
        if self.active:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        return False


def random_config(configs: Dict[str, Sequence[Any]], seed: int = None) -> Dict[str, Any]:
    r"""Uniformly samples one value per key (random hyper-parameter search).

    Parity with reference ``sda/utils.py:28-32``.
    """

    gen = random.Random(seed)

    return {key: gen.choice(list(values)) for key, values in configs.items()}


def save_config(config: Dict[str, Any], path: Path) -> None:
    r"""Writes ``config.json`` next to a run (fails if it already exists).

    Same on-disk format as reference ``sda/utils.py:35-38`` (mode ``'x'``).
    """

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    with open(path / 'config.json', mode='x') as f:
        json.dump(config, f)


def load_config(path: Path) -> Dict[str, Any]:
    r"""Reads ``config.json`` from a run directory (reference ``sda/utils.py:40-42``)."""

    with open(Path(path) / 'config.json', mode='r') as f:
        return json.load(f)
