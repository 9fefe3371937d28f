r"""Checkpointing: single-file parameter snapshots + resumable train state.

TPU-native re-design of reference ``sda/utils.py:35-42`` +
``experiments/*/train.py`` saving. The reference saves weights **only at the
end of training** (``experiments/kolmogorov/train.py:67-70``); here periodic
mid-run checkpoints with resume-from-latest come for free (SURVEY.md §5
flags this as a required improvement).

Formats:
- ``state.msgpack``: the parameter pytree via flax serialization — the analog
  of the reference's ``state.pth``;
- ``checkpoint.msgpack``: full train state (params, optimizer state, epoch,
  PRNG key) for exact resume;
- ``config.json``: unchanged reference format (via ``sda_tpu.utils``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_params(params: Any, path: Path) -> None:
    r"""Serializes a parameter pytree to a single msgpack file."""

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + '.tmp')
    tmp.write_bytes(serialization.to_bytes(params))
    tmp.replace(path)  # atomic: concurrent readers never see a partial file


def load_params(template: Any, path: Path) -> Any:
    r"""Deserializes a parameter pytree; ``template`` supplies the structure
    (e.g. from ``module.init`` with dummy inputs)."""

    return serialization.from_bytes(template, Path(path).read_bytes())


def save_checkpoint(trainer, path: Path) -> None:
    r"""Saves full resumable train state from a :class:`Trainer`."""

    state = {
        'params': trainer.params,
        'opt_state': trainer.opt_state,
        'epoch': trainer.epoch,
        'key': jax.random.key_data(trainer.key),
    }

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + '.tmp')
    tmp.write_bytes(serialization.to_bytes(state))
    tmp.replace(path)  # atomic: a killed run leaves the previous checkpoint


def restore_checkpoint(trainer, path: Path) -> None:
    r"""Restores a :class:`Trainer` in place from :func:`save_checkpoint`."""

    template = {
        'params': trainer.params,
        'opt_state': trainer.opt_state,
        'epoch': 0,
        'key': jax.random.key_data(trainer.key),
    }

    state = serialization.from_bytes(template, Path(path).read_bytes())

    trainer.params = state['params']
    trainer.opt_state = state['opt_state']
    trainer.epoch = int(state['epoch'])
    trainer.key = jax.random.wrap_key_data(jnp.asarray(state['key']))
