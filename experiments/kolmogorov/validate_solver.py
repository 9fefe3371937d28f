#!/usr/bin/env python
r"""Physics validation GATE for the pseudo-spectral Kolmogorov solver.

Statistical checks replacing bitwise jax-cfd comparison (SURVEY.md §7 "hard
parts" #1 — different discretizations must be validated distributionally).
Each criterion is *asserted* with a threshold; the script exits nonzero on
any violation.

1. Stationarity: after spin-up, forcing injection balances drag + viscous
   dissipation — the two halves of the window agree within 10% and the
   coefficient of variation of ensemble-mean energy stays below 0.15.
2. Spectrum shape: in 2-D turbulence the *energy* spectrum E(k) peaks at the
   largest scales (k = 1-2) — the inverse energy cascade piles energy at the
   domain scale until the linear drag (-0.1 u, sda/mcs.py:266-272) absorbs
   it. The forcing scale instead shows in the *enstrophy* spectrum
   Z(k) = k^2 E(k), whose peak must sit within [2, 8] (forcing wavenumber 4
   within a factor 2). E(k) must also decay at least as fast as the k^-3
   enstrophy-cascade slope from its low-k maximum to the 2/3-rule
   dealiasing cutoff — the last physically resolved wavenumber (no spectral
   pile-up); the required orders of magnitude scale with resolution
   (3 log10(k_cut/4), ~4 at 256^2).
3. CFL honesty: the substep was sized from max_velocity = 5 with Courant 0.5
   (reference sda/mcs.py:274-284) — half the advective stability margin of
   the IF-RK3 stepper. Instantaneous speeds may exceed 5 in the turbulent
   tail (the safety factor exists for exactly that), but must stay below
   2 x max_velocity = 10, where the margin would be consumed.
4. Sanity: every field finite.

Writes a JSON report and optional spectrum/vorticity figures.
"""

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from utils import PATH, make_chain


def energy_spectrum(chain, x):
    r"""Isotropic energy spectrum E(k) of velocity fields ``(..., 2, H, W)``.

    Uses the solver's real-pair DFT engine (works on TPU runtimes without
    complex/FFT support)."""

    ur, ui = chain.dft.rfft2(x[..., 0, :, :])
    vr, vi = chain.dft.rfft2(x[..., 1, :, :])

    # Half-spectrum: double the interior columns' weight.
    weight = jnp.where(
        (chain.kb[0] == 0) | (chain.kb[0] == chain.size // 2), 1.0, 2.0
    )
    density = 0.5 * (ur**2 + ui**2 + vr**2 + vi**2)
    density = density * weight / float(chain.size) ** 4  # avoid int32 overflow

    k = np.sqrt(np.asarray(chain.k2))
    bins = np.arange(0.5, chain.size // 2)
    spectrum = np.zeros(len(bins) - 1)

    flat_k = k.ravel()
    flat_d = np.asarray(density).reshape(-1, flat_k.size).mean(axis=0)

    for i in range(len(bins) - 1):
        m = (flat_k >= bins[i]) & (flat_k < bins[i + 1])
        spectrum[i] = flat_d[m].sum()

    return 0.5 * (bins[:-1] + bins[1:]), spectrum


def main(size: int = 256, spinup: int = 64, window: int = 64, ensemble: int = 4):
    chain = make_chain(size=size)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)

    x = chain.prior(k1, (ensemble,))
    x = chain.trajectory(k2, x, length=spinup, last=True)
    xs = chain.trajectory(k3, x, length=window)  # (window, ensemble, 2, H, W)

    energy = np.asarray(0.5 * jnp.mean(xs**2, axis=(-3, -2, -1)))  # (window, ens)
    speed = np.asarray(jnp.sqrt(jnp.sum(xs**2, axis=-3)))

    centers, spectrum = energy_spectrum(chain, xs[-1])
    enstrophy_spectrum = centers**2 * spectrum
    k_cut = (2.0 / 3.0) * (size // 2)  # 2/3-rule dealiasing cutoff

    half = window // 2
    report = {
        'size': size,
        'substeps_per_dt': chain.steps,
        'mean_energy_first_half': float(energy[:half].mean()),
        'mean_energy_second_half': float(energy[half:].mean()),
        'energy_cv_over_time': float(energy.mean(axis=1).std() / energy.mean()),
        'max_speed': float(speed.max()),
        'spectrum_peak_k': float(centers[np.argmax(spectrum)]),
        'enstrophy_peak_k': float(centers[np.argmax(enstrophy_spectrum)]),
        # Decay is measured at the 2/3-rule dealiasing cutoff (~0.85 at
        # 256^2) — the last *physically resolved* wavenumber. Bins beyond it
        # hold only truncation-suppressed energy, which would inflate the
        # measured decay for free.
        'spectrum_decay_orders': float(
            np.log10(
                spectrum[centers < 8].max()
                / max(spectrum[(centers >= 0.85 * k_cut) & (centers < k_cut)].mean(), 1e-30)
            )
        ),
        # The enstrophy-cascade slope is k^-3: from the forcing scale (k=4)
        # to the dealiasing cutoff the spectrum must fall at least that
        # fast. A fixed threshold would be resolution-dependent (the cutoff
        # grows with size); 3 log10(k_cut/4) is ~4.0 orders at 256^2
        # (k_cut ~ 85), ~3.1 at 128^2, and ~2.2 at 64^2 (k_cut ~ 21).
        'spectrum_decay_required': float(3.0 * np.log10(k_cut / 4.0)),
        'finite': bool(np.all(np.isfinite(np.asarray(xs)))),
    }

    # --- the gate (docstring criteria, same numbering) ----------------------
    checks = {
        'stationary_halves_within_10pct': abs(
            report['mean_energy_second_half'] - report['mean_energy_first_half']
        ) < 0.10 * report['mean_energy_first_half'],
        'energy_cv_below_0.15': report['energy_cv_over_time'] < 0.15,
        'energy_peak_at_large_scales': report['spectrum_peak_k'] <= 2.0,
        'enstrophy_peak_near_forcing': 2.0 <= report['enstrophy_peak_k'] <= 8.0,
        'spectrum_decay_sufficient': (
            report['spectrum_decay_orders'] >= report['spectrum_decay_required']
        ),
        'max_speed_below_2x_cfl_assumption': report['max_speed'] < 10.0,
        'all_finite': report['finite'],
    }
    report['checks'] = checks
    report['passed'] = all(checks.values())

    out = PATH / 'results/solver_validation.json'
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))

    try:
        import matplotlib

        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].loglog(centers, spectrum)
        axes[0].axvline(4, ls='--', c='grey')
        axes[0].set(xlabel='k', ylabel='E(k)', title='energy spectrum')
        axes[1].plot(energy.mean(axis=1))
        axes[1].set(xlabel='step', ylabel='energy', title='energy history')
        fig.tight_layout()
        fig.savefig(PATH / 'results/solver_validation.png', dpi=120)

        from utils import vorticity2rgb
        from sda_tpu.dynamics import vorticity
        from PIL import Image

        w = np.asarray(vorticity(xs[-1, 0]))
        scale = float(np.abs(w).max())
        Image.fromarray(
            vorticity2rgb(w, vmin=-scale, vmax=scale)
        ).save(PATH / 'results/vorticity_sample.png')
    except Exception as err:
        print(f'figures skipped: {err}')

    if not report['passed']:
        failed = [name for name, ok in checks.items() if not ok]
        raise SystemExit(f'solver validation FAILED: {failed}')

    print('solver validation PASSED')
    return report


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--size', type=int, default=256)
    parser.add_argument('--spinup', type=int, default=64)
    parser.add_argument('--window', type=int, default=64)
    parser.add_argument('--ensemble', type=int, default=4)
    args = parser.parse_args()

    main(args.size, args.spinup, args.window, args.ensemble)
