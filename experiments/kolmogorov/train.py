#!/usr/bin/env python
r"""Kolmogorov score training — windowed U-Net kernel.

TPU-native counterpart of reference ``experiments/kolmogorov/train.py``:
same config (window 5, U-Net (96,192,384)x(3,3,3), 4096 epochs, batch 32,
AdamW 2e-4, linear decay), trained on flattened 5-frame windows of the 64^2
dataset with jitted on-device epochs and periodic resumable checkpoints.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, init_score, make_score

from sda_tpu.diffusion import VPSDE, bind_eps
from sda_tpu.dynamics import vorticity
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
    # Architecture (reference experiments/kolmogorov/train.py:15-30)
    'window': 5,
    'embedding': 64,
    'hidden_channels': (96, 192, 384),
    'hidden_blocks': (3, 3, 3),
    'kernel_size': 3,
    'activation': 'SiLU',
    # Training
    'epochs': 4096,
    'batch_size': 32,
    'optimizer': 'AdamW',
    'learning_rate': 2e-4,
    'weight_decay': 1e-3,
    'scheduler': 'linear',
}


def train(seed: int, epochs: int = None, use_mesh: bool = False, bf16: bool = False, resume: bool = False, size: int = 64, data: str = 'data', batch_size: int = None):
    config = dict(CONFIG)
    if epochs is not None:
        config['epochs'] = epochs
    if bf16:
        config['bf16'] = True
    if batch_size is not None:
        config['batch_size'] = batch_size
    config['size'] = size

    # 128^2-native runs (beyond the reference, which only models 64^2
    # coarsened fields) get their own run-name family.
    name = f'unet_{seed}' if size == 64 else f'unet{size}_{seed}'
    runpath = PATH / f'runs/{name}'
    runpath.mkdir(parents=True, exist_ok=True)
    if not (runpath / 'config.json').exists():
        save_config(config, runpath)

    logger = RunLogger(runpath)
    key = jax.random.key(seed)
    k_init, k_train, k_sample = jax.random.split(key, 3)

    window = config['window']
    module = make_score(**config)
    params = init_score(module, key=k_init)
    sde = VPSDE(shape=(window * 2, size, size))

    trainset = TrajectoryDataset(PATH / f'{data}/train.h5', window=window, flatten=True)
    validset = TrajectoryDataset(PATH / f'{data}/valid.h5', window=window, flatten=True)

    trainer = Trainer(
        sde, module, params, trainset, validset,
        key=k_train,
        mesh=make_mesh() if use_mesh else None,
        **config,
    )

    # Resume from the latest mid-run checkpoint (idempotent re-runs).
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

    # Final sanity sample (reference train.py:73-77)
    sample_sde = VPSDE(eps=bind_eps(module, trainer.params), shape=(window * 2, size, size))
    x = sample_sde.sample(k_sample, (2,), steps=64)
    x = x.reshape(2, -1, 2, size, size)
    w = vorticity(x)

    try:
        from utils import draw

        draw(np.asarray(w)).save(runpath / 'samples.png')
    except Exception as err:
        print(f'sample rendering skipped: {err}')

    logger.finish()
    print(f'{name}: done')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--mesh', action='store_true')
    parser.add_argument('--bf16', action='store_true', help='bf16 network compute (params stay f32)')
    parser.add_argument('--resume', action='store_true', help='continue from the latest checkpoint')
    parser.add_argument('--size', type=int, default=64,
                        help='field resolution (128 for the 128^2-native model)')
    parser.add_argument('--data', type=str, default=None,
                        help="dataset subdir (default: 'data' at 64, "
                             "'data<size>' otherwise)")
    parser.add_argument('--batch', type=int, default=None,
                        help='batch size override (HBM lever for 256^2-native '
                             'training; default: config 32)')
    args = parser.parse_args()

    data = args.data or ('data' if args.size == 64 else f'data{args.size}')
    train(args.seed, args.epochs, args.mesh, args.bf16, args.resume,
          size=args.size, data=data, batch_size=args.batch)
