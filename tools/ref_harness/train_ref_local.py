#!/usr/bin/env python
r"""Diagnostic: train the UNMODIFIED reference local score (k=2 window MLP)
on our Lorenz dataset with torch-CPU, to bisect the local-model fidelity gap
(VERDICT.md weak #1) into {model, sampler} halves.

Runs the reference's own sda.score / sda.nn / sda.utils code (zuko stubbed).
Output: tools/ref_harness/out/state.pth + loss log.
"""

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))          # zuko stub
sys.path.insert(0, '/root/reference')  # reference sda package

import json
import time

import torch

torch.manual_seed(0)
torch.set_num_threads(1)

from sda.score import VPSDE, MCScoreNet  # noqa: E402
from sda.utils import TrajectoryDataset, loop  # noqa: E402

DATA = Path('/root/repo/experiments/lorenz/storage/data')
OUT = HERE / 'out'
OUT.mkdir(exist_ok=True)

CONFIG = {
    'window': 5,
    'embedding': 32,
    'width': 256,
    'depth': 5,
    'activation': 'SiLU',
    'epochs': 4096,
    'batch_size': 64,
    'optimizer': 'AdamW',
    'learning_rate': 1e-3,
    'weight_decay': 1e-3,
    'scheduler': 'linear',
}


def main(epochs: int):
    window = CONFIG['window']

    score = MCScoreNet(
        features=3,
        order=window // 2,
        embedding=CONFIG['embedding'],
        hidden_features=[CONFIG['width']] * CONFIG['depth'],
        activation=torch.nn.SiLU,
    )
    sde = VPSDE(score.kernel, shape=(window * 3,))

    trainset = TrajectoryDataset(DATA / 'train.h5', window=window, flatten=True)
    validset = TrajectoryDataset(DATA / 'valid.h5', window=window, flatten=True)

    cfg = dict(CONFIG, epochs=epochs)
    start = time.time()

    log = open(OUT / 'loss.jsonl', 'w')
    for i, (lt, lv, lr) in enumerate(loop(sde, trainset, validset, **cfg)):
        log.write(json.dumps({'epoch': i, 'loss_train': lt, 'loss_valid': lv, 'lr': lr, 'time': time.time() - start}) + '\n')
        if i % 64 == 0:
            log.flush()
            torch.save(score.state_dict(), OUT / 'state.pth')

    torch.save(score.state_dict(), OUT / 'state.pth')
    log.close()
    print(f'done in {time.time() - start:.0f}s')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else CONFIG['epochs'])
