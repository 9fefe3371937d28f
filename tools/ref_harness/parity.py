#!/usr/bin/env python
r"""Diagnostic: numerical parity of the FULL local-score inference stack
(unfold -> ScoreNet kernel -> fold -> GaussianScore guidance) between the
unmodified reference torch code and sda_tpu, with identical weights/inputs.

If this passes at ~1e-5, any fidelity gap is a *training* artifact, not an
inference bug.
"""

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo')

import numpy as np
import torch

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

import jax.numpy as jnp  # noqa: E402

from sda.score import (  # noqa: E402  (reference)
    GaussianScore as RefGaussianScore,
    MCScoreNet as RefMCScoreNet,
    VPSDE as RefVPSDE,
)

from sda_tpu.diffusion import (  # noqa: E402  (ours)
    GaussianScore, MCScoreNet, VPSDE, bind_eps,
)

from convert import flax_to_torch_kernel  # noqa: E402

sys.path.insert(0, '/root/repo/experiments/lorenz')
from utils import load_score, make_trajectory_eps  # noqa: E402


def main():
    rng = np.random.RandomState(0)

    # --- our trained local model + its torch twin --------------------------
    runpath = Path('/root/repo/experiments/lorenz/storage/runs/local_0')
    module, params, config = load_score(runpath, local=True)
    window = config['window']

    ref_score = RefMCScoreNet(
        features=3,
        order=window // 2,
        embedding=config['embedding'],
        hidden_features=[config['width']] * config['depth'],
        activation=torch.nn.SiLU,
    )
    sd = {k: torch.from_numpy(np.array(v)) for k, v in flax_to_torch_kernel(params).items()}
    ref_score.load_state_dict(sd)
    ref_score.eval()

    # --- identical inputs ---------------------------------------------------
    B, L = 4, 65
    x = rng.randn(B, L, 3).astype(np.float32)
    t = np.float32(0.37)

    # 1) plain trajectory eps
    with torch.no_grad():
        e_ref = ref_score(torch.from_numpy(x), torch.tensor(t)).numpy()

    ours = make_trajectory_eps(module, params, local=True, window=window)
    e_jax = np.asarray(ours(jnp.asarray(x), jnp.float32(t)))

    d1 = np.max(np.abs(e_ref - e_jax)) / (np.max(np.abs(e_ref)) + 1e-12)
    print(f'traj eps   rel-max-diff: {d1:.3e}')

    # 2) guided eps (GaussianScore over the lo observation pattern)
    step, sigma = 8, 0.05
    y = rng.randn((L - 1) // step + 1, 1).astype(np.float32)

    ref_g = RefGaussianScore(
        y=torch.from_numpy(y),
        A=lambda x: x[..., ::step, :1],
        std=sigma,
        sde=RefVPSDE(ref_score, shape=()),
        gamma=3e-2,
    )
    g_ref = ref_g(torch.from_numpy(x), torch.tensor(t)).detach().numpy()

    our_g = GaussianScore(
        y=jnp.asarray(y),
        A=lambda x: x[..., ::step, :1],
        std=sigma,
        sde=VPSDE(eps=ours, shape=()),
        gamma=3e-2,
    )
    g_jax = np.asarray(our_g(jnp.asarray(x), jnp.float32(t)))

    d2 = np.max(np.abs(g_ref - g_jax)) / (np.max(np.abs(g_ref)) + 1e-12)
    print(f'guided eps rel-max-diff: {d2:.3e}')

    ok = d1 < 1e-4 and d2 < 1e-4
    print('PARITY OK' if ok else 'PARITY FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
