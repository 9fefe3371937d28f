#!/usr/bin/env python
r"""QG score training — windowed U-Net kernel over 2-layer PV fields.

Same training recipe as the Kolmogorov pack (window 5, U-Net (96,192,384),
batch 32, AdamW 2e-4, linear decay, jitted on-device epochs, resumable
checkpoints); the kernel is a plain circular ScoreUNet (no forcing channel —
the QG background is spatially homogeneous).
"""

import argparse

import jax
import numpy as np

from utils import PATH, init_score, make_score

from sda_tpu.diffusion import VPSDE, bind_eps
from sda_tpu.parallel import make_mesh
from sda_tpu.train import (
    RunLogger,
    TrajectoryDataset,
    Trainer,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from sda_tpu.utils import save_config


CONFIG = {
    'window': 5,
    'embedding': 64,
    'hidden_channels': (96, 192, 384),
    'hidden_blocks': (3, 3, 3),
    'kernel_size': 3,
    'activation': 'SiLU',
    'size': 64,
    # Training
    'epochs': 4096,
    'batch_size': 32,
    'optimizer': 'AdamW',
    'learning_rate': 2e-4,
    'weight_decay': 1e-3,
    'scheduler': 'linear',
}


def train(seed: int, epochs: int = None, use_mesh: bool = False, resume: bool = False):
    config = dict(CONFIG)
    if epochs is not None:
        config['epochs'] = epochs

    runpath = PATH / f'runs/qg_{seed}'
    runpath.mkdir(parents=True, exist_ok=True)
    if not (runpath / 'config.json').exists():
        save_config(config, runpath)

    logger = RunLogger(runpath)
    key = jax.random.key(seed)
    k_init, k_train, k_sample = jax.random.split(key, 3)

    window = config['window']
    module = make_score(**config)
    params = init_score(module, size=config['size'], key=k_init)
    sde = VPSDE(shape=(window * 2, 64, 64))

    trainset = TrajectoryDataset(PATH / 'data/train.h5', window=window, flatten=True)
    validset = TrajectoryDataset(PATH / 'data/valid.h5', window=window, flatten=True)

    trainer = Trainer(
        sde, module, params, trainset, validset,
        key=k_train,
        mesh=make_mesh() if use_mesh else None,
        **config,
    )

    ckpt = runpath / 'checkpoint.msgpack'
    if resume and ckpt.exists():
        restore_checkpoint(trainer, ckpt)
        print(f'resumed at epoch {trainer.epoch}')

    for stats in trainer:
        logger.log(stats, step=trainer.epoch)

        if trainer.epoch % 64 == 0:
            save_checkpoint(trainer, ckpt)
            # Loadable weights snapshot: a timeout-killed run stays usable.
            save_params(trainer.params, runpath / 'state.msgpack')

    save_params(trainer.params, runpath / 'state.msgpack')

    # Final sanity sample: unconditional windows, rendered per layer.
    sample_sde = VPSDE(eps=bind_eps(module, trainer.params), shape=(window * 2, 64, 64))
    x = sample_sde.sample(k_sample, (2,), steps=64)
    x = x.reshape(2, window, 2, 64, 64)

    try:
        from utils import draw

        w = np.asarray(x[:, -1])  # last frame, both layers -> (2, 2, H, W)
        scale = float(np.abs(w).max())
        draw(w, vmin=-scale, vmax=scale).save(runpath / 'samples.png')
    except Exception as err:
        print(f'sample rendering skipped: {err}')

    logger.finish()
    print(f'qg_{seed}: done')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--mesh', action='store_true')
    parser.add_argument('--resume', action='store_true')
    args = parser.parse_args()

    train(args.seed, args.epochs, args.mesh, args.resume)
