#!/usr/bin/env python
r"""Lorenz score training — global (time-as-space U-Net) and local (windowed
MLP kernel) models.

TPU-native counterpart of reference ``experiments/lorenz/train.py``: same
configs (4096 epochs, batch 64, AdamW 1e-3, linear decay), with the training
loop running as jitted on-device epochs and periodic resumable checkpoints
(an improvement over the reference's end-only save).
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import (
    PATH,
    init_score,
    log_prior,
    make_chain,
    make_global_score,
    make_local_score,
)

from sda_tpu.diffusion import MCScoreWrapper, VPSDE, bind_eps
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


GLOBAL_CONFIG = {
    # Architecture (reference experiments/lorenz/train.py:15-28)
    'embedding': 32,
    'hidden_channels': (64,),
    'hidden_blocks': (3,),
    'activation': 'SiLU',
    # Training
    'epochs': 4096,
    'batch_size': 64,
    'optimizer': 'AdamW',
    'learning_rate': 1e-3,
    'weight_decay': 1e-3,
    'scheduler': 'linear',
}

LOCAL_CONFIG = {
    # Architecture (reference experiments/lorenz/train.py:30-44)
    'window': 5,
    'embedding': 32,
    'width': 256,
    'depth': 5,
    'activation': 'SiLU',
    # Training
    'epochs': 4096,
    'batch_size': 64,
    'optimizer': 'AdamW',
    'learning_rate': 1e-3,
    'weight_decay': 1e-3,
    'scheduler': 'linear',
}


def train(model: str, seed: int, epochs: int = None, use_mesh: bool = False, resume: bool = False, window: int = None):
    config = dict(GLOBAL_CONFIG if model == 'global' else LOCAL_CONFIG)
    if epochs is not None:
        config['epochs'] = epochs
    if window is not None and model == 'local':
        config['window'] = window

    # Run naming: local models carry their Markov order k = window // 2 (the
    # reference's k-sweep trains k = 1..4, eval.py:33-39); 'local_{seed}'
    # remains the legacy k=2 name from round 1.
    if model == 'local' and window is not None:
        runpath = PATH / f'runs/local_k{config["window"] // 2}_{seed}'
    else:
        runpath = PATH / f'runs/{model}_{seed}'
    runpath.mkdir(parents=True, exist_ok=True)
    if not (runpath / 'config.json').exists():
        save_config(config, runpath)

    logger = RunLogger(runpath)
    key = jax.random.key(seed)
    k_init, k_train, k_sample = jax.random.split(key, 3)

    # Network + SDE
    if model == 'global':
        module = make_global_score(**config)
        params = init_score(module, key=k_init)
        sde = VPSDE(shape=(32, 3))
        eps_wrapper = MCScoreWrapper
        window, flatten = 32, False
    else:
        window = config['window']
        module = make_local_score(**config)
        params = init_score(module, window=window, key=k_init)
        sde = VPSDE(shape=(window * 3,))
        eps_wrapper = None
        flatten = True

    # Data
    trainset = TrajectoryDataset(PATH / 'data/train.h5', window=window, flatten=flatten)
    validset = TrajectoryDataset(PATH / 'data/valid.h5', window=window, flatten=flatten)

    # Training
    trainer = Trainer(
        sde, module, params, trainset, validset,
        key=k_train,
        mesh=make_mesh() if use_mesh else None,
        eps_wrapper=eps_wrapper,
        **config,
    )

    # Resume from the latest mid-run checkpoint (idempotent re-runs — the
    # analog of the reference's Slurm @ensure pattern, SURVEY.md C31/C33).
    ckpt = runpath / 'checkpoint.msgpack'
    if resume and ckpt.exists():
        restore_checkpoint(trainer, ckpt)
        print(f'resumed at epoch {trainer.epoch}')

    for stats in trainer:
        logger.log(stats, step=trainer.epoch)

        if trainer.epoch % 256 == 0:
            save_checkpoint(trainer, ckpt)
            # Keep a loadable weights snapshot too, so a timeout-killed run
            # still yields a usable (if under-trained) model for eval/bench.
            save_params(trainer.params, runpath / 'state.msgpack')

    # Save final weights (reference format analog)
    save_params(trainer.params, runpath / 'state.msgpack')

    # Final physics-consistency evaluation (reference train.py:86-93)
    chain = make_chain()
    eps = bind_eps(module, trainer.params)

    if model == 'global':
        sample_sde = VPSDE(eps=MCScoreWrapper(eps), shape=(32, 3))
        x = sample_sde.sample(k_sample, (1024,), steps=64)
    else:
        sample_sde = VPSDE(eps=eps, shape=(window * 3,))
        x = sample_sde.sample(k_sample, (4096,), steps=64)
        x = x.reshape(x.shape[0], -1, 3)

    x = chain.postprocess(x)
    log_p = float(jnp.mean(chain.log_prob(x[:, :-1], x[:, 1:])))

    logger.log({'log_p': log_p})
    logger.finish()
    print(f'{runpath.name}: final log_p = {log_p:.3f}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--model', choices=['global', 'local'], default='local')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--mesh', action='store_true', help='shard batches over all devices')
    parser.add_argument('--resume', action='store_true', help='continue from the latest checkpoint')
    parser.add_argument('--window', type=int, default=None, help='local window size 2k+1 (k-sweep)')
    args = parser.parse_args()

    train(args.model, args.seed, args.epochs, args.mesh, args.resume, args.window)
