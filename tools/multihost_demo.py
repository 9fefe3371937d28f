#!/usr/bin/env python
r"""Multi-host (DCN-style) data-parallel training demo with a parity check.

The reference's only scale-out is Slurm job arrays — independent processes,
no cross-job communication (SURVEY.md §5, reference
``experiments/lorenz/train.py:47,97`` ``@job(array=...)``). This demo runs
the REAL :class:`sda_tpu.train.Trainer` as ONE SPMD program across multiple
processes (the multi-controller runtime JAX uses for multi-host TPU pods):

- every process holds only its own shard of the dataset
  (:func:`host_sharded_array` — the dataset never has to fit on one host);
- the global ``dp`` mesh spans all processes, so the per-batch sharding
  constraint splits compute across hosts and XLA inserts the cross-host
  psum for the gradients (DCN collectives on a real pod, Gloo/TCP here);
- process 0 then re-runs the same epochs single-process on its local
  devices and asserts loss parity: the distributed program computes exactly
  the same mathematics.

Run (2 processes x 4 virtual CPU devices):

    python tools/multihost_demo.py --launch 2

Each worker is this same file with ``--pid`` set; ``--launch`` picks a free
port, spawns the workers, and fails loudly unless every worker prints its
parity line.
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def worker(pid: int, procs: int, port: int, devices: int) -> None:
    import jax

    jax.config.update('jax_platforms', 'cpu')

    sys.path.insert(0, str(REPO))

    # The documented entry point: `import sda_tpu` is deliberately
    # backend-free, so the distributed runtime can come up first.
    from sda_tpu.parallel import host_sharded_array, init_multihost, make_mesh

    init_multihost(f'127.0.0.1:{port}', num_processes=procs, process_id=pid)

    assert jax.process_count() == procs
    assert jax.device_count() == procs * devices

    import numpy as np

    from sda_tpu.diffusion import ScoreUNet, VPSDE
    from sda_tpu.train import TrajectoryDataset, Trainer

    # Identical config everywhere; each process keeps only its data shard.
    window, batch, n, length, size = 3, 16, 64, 8, 16
    assert n % procs == 0, (
        f'dataset rows ({n}) must divide over {procs} processes — '
        'host_sharded_array needs equal per-process shards'
    )
    rng = np.random.RandomState(0)
    data = rng.standard_normal((n, length, 2, size, size)).astype(np.float32)
    shard = data[pid * (n // procs):(pid + 1) * (n // procs)]

    module = ScoreUNet(
        channels=window * 2, embedding=8, hidden_channels=(8, 16),
        hidden_blocks=(1, 1), activation=jax.nn.silu,
    )
    params = module.init(
        jax.random.key(0),
        np.zeros((1, window * 2, size, size), np.float32),
        np.ones(()),
    )['params']
    # Host copies: the Trainer donates jax.Array params to its jitted
    # epoch, and both runs below must start from the same weights.
    params = jax.tree_util.tree_map(np.asarray, params)
    sde = VPSDE(shape=(window * 2, size, size))

    def make_trainer(mesh, train_data, valid_data):
        trainer = Trainer(
            sde, module, params,
            TrajectoryDataset(train_data, window=window, flatten=True),
            TrajectoryDataset(valid_data, window=window, flatten=True),
            epochs=3, batch_size=batch, learning_rate=1e-3,
            key=jax.random.key(1), mesh=mesh,
        )
        return trainer

    # -- Distributed run: global mesh over all hosts ------------------------
    mesh = make_mesh({'dp': jax.device_count()})
    k_valid = max(len(shard) // 2, 1)
    g_train = host_sharded_array(shard, mesh)
    g_valid = host_sharded_array(shard[:k_valid], mesh)

    losses = [s['loss_train'] for s in make_trainer(mesh, g_train, g_valid)]
    print(f'[{pid}] multihost losses: {losses}', flush=True)

    # -- Parity: same program, one process, local devices -------------------
    # Reconstruct the global arrays' contents host-side (shard p occupies
    # contiguous rows p*local : (p+1)*local of the global array).
    per = n // procs
    valid_ref = np.concatenate(
        [data[p * per: p * per + k_valid] for p in range(procs)]
    )
    local_mesh = make_mesh({'dp': devices}, devices=jax.local_devices())
    ref = [
        s['loss_train']
        for s in make_trainer(local_mesh, data, valid_ref)
    ]
    # Identical batch indices, crops, and loss keys => identical math; the
    # only difference is where the FLOPs ran and the cross-host psum.
    err = max(abs(a - b) for a, b in zip(losses, ref))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    assert err < 1e-3, f'parity {err}'
    print(f'[{pid}] PARITY OK: max |loss diff| = {err:.2e}', flush=True)

    # -- Guided sampling, trajectory axis sharded ACROSS hosts --------------
    # The sp halo exchange (ppermute in ShardedMCScoreNet) now crosses the
    # process boundary — on a pod this is the DCN path of
    # `assimilate.py --mesh sp=N`.
    import jax.numpy as jnp

    from sda_tpu.diffusion import GaussianScore, MCScoreNet, bind_eps
    from sda_tpu.parallel import ShardedMCScoreNet

    kernel = bind_eps(module, params)
    order = window // 2
    length = 4 * jax.device_count()  # divides over sp

    y = np.asarray(
        jax.random.normal(jax.random.key(2), (2, size, size))
    ) * 0.1
    A = lambda x: x[..., 0, :, :, :] - x[..., -1, :, :, :]  # loop closure

    def guided_sample(score):
        g_sde = VPSDE(
            eps=GaussianScore(
                y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
            ),
            shape=(length, 2, size, size),
        )
        return g_sde.sample(
            jax.random.key(3), (2,), steps=4, corrections=1, tau=0.5
        )

    sp_mesh = make_mesh({'sp': jax.device_count()})
    x_sharded = guided_sample(ShardedMCScoreNet(kernel, order, mesh=sp_mesh))
    x_plain = guided_sample(MCScoreNet(kernel, order))

    sp_err = float(jnp.max(jnp.abs(x_sharded - x_plain)))
    assert np.isfinite(np.asarray(x_plain)).all()
    assert sp_err < 1e-4, f'sp parity {sp_err}'
    print(f'[{pid}] SP PARITY OK: max |sample diff| = {sp_err:.2e}',
          flush=True)


def launch(procs: int, devices: int) -> None:
    import socket

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={devices}'
    env.pop('JAX_PLATFORMS', None)

    workers = [
        subprocess.Popen(
            [sys.executable, __file__, '--pid', str(pid), '--procs',
             str(procs), '--port', str(port), '--devices', str(devices)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(procs)
    ]

    import time

    deadline = time.monotonic() + 480  # global budget, not per worker

    ok = True
    try:
        for pid, w in enumerate(workers):
            out, _ = w.communicate(
                timeout=max(10.0, deadline - time.monotonic())
            )
            if w.returncode != 0 or 'PARITY OK' not in out:
                ok = False
                print(f'--- worker {pid} FAILED (rc={w.returncode}) ---')
                print(out[-3000:])
            else:
                print('\n'.join(
                    l for l in out.splitlines() if l.startswith(f'[{pid}]')
                ))
    finally:
        # A worker that died before the distributed barrier leaves its
        # peers blocked in collectives — never leak them.
        for w in workers:
            if w.poll() is None:
                w.kill()

    if not ok:
        sys.exit(1)
    print(f'MULTIHOST DEMO OK ({procs} processes x {devices} devices)')


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--launch', type=int, default=None,
                        help='spawn N worker processes and check parity')
    parser.add_argument('--devices', type=int, default=4,
                        help='virtual devices per process')
    parser.add_argument('--pid', type=int, default=None)
    parser.add_argument('--procs', type=int, default=2)
    parser.add_argument('--port', type=int, default=9911)
    args = parser.parse_args()

    if args.launch is not None:
        launch(args.launch, args.devices)
    else:
        worker(args.pid, args.procs, args.port, args.devices)
