#!/usr/bin/env python
r"""Imports the reference-trained local kernel (out/state.pth) as a run dir
our eval.py can load: runs/ref_local_0/{config.json, state.msgpack}."""

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, '/root/repo')

import torch  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

from sda_tpu.train import save_params  # noqa: E402
from convert import torch_kernel_to_flax  # noqa: E402

CONFIG = {
    'window': 5, 'embedding': 32, 'width': 256, 'depth': 5,
    'activation': 'SiLU', 'epochs': 4096, 'batch_size': 64,
    'optimizer': 'AdamW', 'learning_rate': 1e-3, 'weight_decay': 1e-3,
    'scheduler': 'linear',
}


def main():
    sd = torch.load(HERE / 'out/state.pth', map_location='cpu')
    params = torch_kernel_to_flax(sd)

    runpath = Path('/root/repo/experiments/lorenz/storage/runs/ref_local_0')
    runpath.mkdir(parents=True, exist_ok=True)
    (runpath / 'config.json').write_text(json.dumps(CONFIG))
    save_params(params, runpath / 'state.msgpack')
    print(f'imported -> {runpath}')


if __name__ == '__main__':
    main()
