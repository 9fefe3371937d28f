#!/usr/bin/env python
r"""Headline benchmark: Kolmogorov 256^2 trajectory generation throughput.

This is the one workload for which the reference states a concrete
performance envelope on concrete hardware: one trajectory = 128 NS steps at
256^2 (dt=0.2, Re=1e3, CFL substepping) within a **300 s** single-CPU Slurm
budget (reference ``experiments/kolmogorov/generate.py:16-26``; BASELINE.md).
The reference implementation additionally crosses the torch<->JAX boundary
twice per step (``sda/mcs.py:333-338``).

Here the same physical workload runs as a single scanned spectral program on
one TPU chip — vorticity advanced in Fourier space via MXU matmul-DFT,
batched over an ensemble. Prints ONE JSON line:
``value`` = trajectories/minute/chip, ``vs_baseline`` = reference budget
(300 s/trajectory) divided by our per-trajectory wall-clock.
"""

import json
import time

import jax


def main():
    from sda_tpu.dynamics import KolmogorovFlow
    from sda_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    size, length, batch = 256, 128, 16

    chain = KolmogorovFlow(size=size, dt=0.2)

    @jax.jit
    def simulate(key):
        k1, k2 = jax.random.split(key)
        x = chain.prior(k1, (batch,))
        return chain.trajectory(k2, x, length=length, last=True)

    # Warmup/compile + correctness guard: a diverged solver must never
    # report throughput.
    import numpy as np

    out = jax.block_until_ready(simulate(jax.random.key(0)))
    final = np.asarray(out)
    assert np.all(np.isfinite(final)), 'solver produced non-finite states'
    rms = float(np.sqrt((final**2).mean()))
    assert 0.1 < rms < 10.0, f'solver statistics off (rms={rms})'

    t0 = time.perf_counter()
    jax.block_until_ready(simulate(jax.random.key(1)))
    t1 = time.perf_counter()

    per_traj = (t1 - t0) / batch
    per_min = 60.0 / per_traj

    print(
        json.dumps(
            {
                'metric': 'kolmogorov_256_trajectories_per_minute',
                'value': round(per_min, 3),
                'unit': f'trajectories/min/chip (128 steps @ 256^2, dt=0.2, {chain.steps} substeps/step, batch {batch})',
                'vs_baseline': round(300.0 / per_traj, 2),
            }
        )
    )


if __name__ == '__main__':
    main()
