r"""Tests for the training runtime (dataset, trainer, checkpointing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sda_tpu.diffusion import ScoreNet, VPSDE, bind_eps
from sda_tpu.train import (
    TrajectoryDataset,
    Trainer,
    load_h5,
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_h5,
    save_params,
)


def make_toy_setup(window=3, n=64, length=16, channels=2):
    data = np.random.RandomState(0).randn(n, length, channels).astype(np.float32)

    trainset = TrajectoryDataset(data, window=window, flatten=True)
    validset = TrajectoryDataset(data[: n // 4], window=window, flatten=True)

    module = ScoreNet(features=window * channels, embedding=8, hidden_features=(32,))
    sde = VPSDE(shape=(window * channels,))

    x0 = jnp.zeros((1, window * channels))
    params = module.init(jax.random.key(0), x0, jnp.ones((1,)))['params']

    return sde, module, params, trainset, validset


def test_h5_roundtrip(tmp_path):
    x = np.random.randn(4, 8, 3).astype(np.float32)
    save_h5(tmp_path / 'data/x.h5', x)
    y = load_h5(tmp_path / 'data/x.h5')

    np.testing.assert_allclose(x, y)


def test_dataset_crop_shapes():
    data = np.random.randn(10, 20, 3).astype(np.float32)

    ds = TrajectoryDataset(data, window=5)
    x = ds.crop(jax.random.key(0), ds.data[:4])
    assert x.shape == (4, 5, 3)

    ds_flat = TrajectoryDataset(data, window=5, flatten=True)
    x = ds_flat.crop(jax.random.key(0), ds_flat.data[:4])
    assert x.shape == (4, 15)


def test_dataset_crop_contents_are_windows():
    # Each cropped row must be a contiguous temporal slice of the original.
    data = np.arange(2 * 10 * 1, dtype=np.float32).reshape(2, 10, 1)
    ds = TrajectoryDataset(data, window=4)

    x = np.asarray(ds.crop(jax.random.key(3), ds.data))

    for i in range(2):
        start = x[i, 0, 0] - data[i, 0, 0]
        np.testing.assert_allclose(
            x[i, :, 0], data[i, int(start) : int(start) + 4, 0]
        )


def test_epoch_batches_cover_dataset():
    ds = TrajectoryDataset(np.zeros((100, 4, 1), dtype=np.float32))
    idx, nb = ds.epoch_batches(jax.random.key(0), 32)

    assert nb == 3
    assert idx.shape == (3, 32)
    flat = np.asarray(idx).ravel()
    assert len(np.unique(flat)) == 96  # no duplicates within an epoch


def test_trainer_reduces_loss():
    sde, module, params, trainset, validset = make_toy_setup()

    trainer = Trainer(
        sde, module, params, trainset, validset,
        epochs=30, batch_size=16, learning_rate=1e-2,
        key=jax.random.key(1),
    )

    stats = [trainer.step_epoch() for _ in range(30)]

    first = np.mean([s['loss_train'] for s in stats[:5]])
    last = np.mean([s['loss_train'] for s in stats[-5:]])

    assert last < first


def test_trainer_lr_schedule():
    sde, module, params, trainset, validset = make_toy_setup()

    trainer = Trainer(
        sde, module, params, trainset, validset,
        epochs=10, batch_size=16, learning_rate=1e-3, scheduler='linear',
    )

    s0 = trainer.step_epoch()
    s1 = trainer.step_epoch()

    np.testing.assert_allclose(s0['lr'], 1e-3, rtol=1e-6)
    np.testing.assert_allclose(s1['lr'], 1e-3 * 0.9, rtol=1e-6)


def test_trainer_rejects_unknown_options():
    sde, module, params, trainset, validset = make_toy_setup()

    with pytest.raises(ValueError):
        Trainer(
            sde, module, params, trainset, validset, optimizer='SGD'
        )

    with pytest.raises(ValueError):
        Trainer(
            sde, module, params, trainset, validset, scheduler='warmup'
        )


def test_params_save_load_roundtrip(tmp_path):
    sde, module, params, trainset, validset = make_toy_setup()

    save_params(params, tmp_path / 'state.msgpack')
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_params(template, tmp_path / 'state.msgpack')

    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_resume(tmp_path):
    sde, module, params, trainset, validset = make_toy_setup()

    trainer = Trainer(
        sde, module, params, trainset, validset,
        epochs=10, batch_size=16, key=jax.random.key(5),
    )
    trainer.step_epoch()
    trainer.step_epoch()

    save_checkpoint(trainer, tmp_path / 'ckpt.msgpack')
    stats_direct = trainer.step_epoch()

    # Fresh trainer restored from the checkpoint continues identically.
    trainer2 = Trainer(
        sde, module, params, trainset, validset,
        epochs=10, batch_size=16, key=jax.random.key(5),
    )
    restore_checkpoint(trainer2, tmp_path / 'ckpt.msgpack')
    assert trainer2.epoch == 2

    stats_resumed = trainer2.step_epoch()

    np.testing.assert_allclose(
        stats_resumed['loss_train'], stats_direct['loss_train'], rtol=1e-4
    )


def test_existing_csv_keys_resume(tmp_path):
    r"""The shared CSV-resume helper: key tuples of already-written rows,
    tolerant of shorter lines and missing files."""

    from sda_tpu.train import append_csv, existing_csv_keys

    csv = tmp_path / 'results.csv'
    assert existing_csv_keys(csv, 3) == set()

    append_csv(csv, 'coarse,sda,unet_0,0.111,0.1')
    append_csv(csv, 'generative,qg_0,upper,,0.98')
    append_csv(csv, 'short,row')  # fewer fields than the key — ignored

    assert existing_csv_keys(csv, 3) == {
        ('coarse', 'sda', 'unet_0'),
        ('generative', 'qg_0', 'upper'),
    }
    # The empty 4th field of the generative row is part of a 4-column key.
    assert ('generative', 'qg_0', 'upper', '') in existing_csv_keys(csv, 4)
