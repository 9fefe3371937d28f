#!/usr/bin/env python
r"""Headline benchmarks on one TPU chip. Prints ONE JSON line.

Three workloads, all single fused XLA programs (the reference runs each as a
Python-level loop — SURVEY.md §3.1/§3.3/§3.4):

1. **Guided assimilation (flagship)** — the fused predictor-corrector sampler
   with the SDA guidance VJP inside one ``lax.scan`` (reference: Python loop
   with ``steps x (1 + corrections)`` kernel launches + autograd re-entry per
   step, ``sda/score.py:249-261,375-396``). Kolmogorov ``coarse`` scenario:
   32-frame trajectory, 8x coarsening every 4th frame, 256 steps x 1
   correction, batch 4 — the notebook cells 9-10 workload.
2. **Score training step** — one jitted epoch step of the Kolmogorov U-Net
   (batch 32, window 5), reference budget 24 h / 4096 epochs on one GPU
   (``experiments/kolmogorov/train.py:33``).
3. **Data generation** — 128-step 256^2 spectral NS trajectories; reference
   budget 300 s/trajectory on one CPU (``generate.py:16-26``).

The flagship runs at the trained checkpoint's compute dtype — the
production runs carry ``bf16: true`` (network compute bf16, params and
guidance Tweedie/VJP f32), so ``sampler_*`` is the bf16-compute program and
``sampler_f32_*`` is the measured f32-compute variant (``bf16_speedup`` =
f32 wall / bf16 wall; ``sampler_residual*`` gates quality for both).

FLOP accounting is ANALYTIC (``sda_tpu/nn/flops.py``): per-layer conv/dense
MAC counts of the exact architecture in ``unet_0/config.json``, x windows
x batch x sampler evals, with a 2.0x forward+VJP multiplier (state-only
gradients: weight-cotangent convs are dead code under sampling — measured
2.02x by XLA on CPU, ``tests/test_flops.py``). The axon backend's
``cost_analysis()`` does not count convolutions (it reported ~300x too few
FLOPs in round 2); it is still printed as ``sampler_tflops_xla_cost`` so the
discrepancy stays visible.

``value``/``vs_baseline`` (the headline) belong to the flagship sampler.
``vs_baseline`` is the measured end-to-end ratio against the UNMODIFIED
torch reference sampler running this scenario on the only hardware it can
run on in this environment — this host's CPU at torch's default thread
count (a 1-core host, so 1 thread; the baseline configuration is recorded
in the JSON's ``baseline_hw``/``vs_baseline_desc`` fields)
(``tools/ref_harness/bench_ref_cpu.py`` measures the reference's per-eval
wall at the production architecture and a window-count-scaled shape; both
frameworks batch the window axis, so per-eval cost scales linearly in
windows x batch). Supporting ratios: ``fusion_speedup`` (same chip,
one-launch-per-eval vs fused — the structural effect with the conv kernels
held fixed) and ``framework_speedup_same_host`` (both frameworks on the
SAME CPU; measured 0.25 — on CPU this measures torch's oneDNN conv kernels
vs XLA:CPU codegen, not sampler structure, see
``tools/ref_harness/bench_ref_cpu.py`` — reported for honesty, not used as
a headline). The MFU figure bounds what any rival TPU implementation could
gain: at X% MFU no implementation can be more than 100/X x faster on this
chip; symmetrically, for the torch reference to match this chip's measured
88.8 TFLOP/s it would need >28% sustained MFU on an A100 — eager per-step
sampling with autograd re-entry does not reach that.
"""

import argparse
import json
import sys
import time

import jax
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chip_peak_flops() -> float:
    r"""Peak bf16 FLOP/s of the attached chip (for MFU)."""

    kind = jax.devices()[0].device_kind.lower()
    if 'v5 lite' in kind or 'v5e' in kind:
        return 197e12
    if 'v4' in kind:
        return 275e12
    if 'v5p' in kind or 'v5' in kind:
        return 459e12
    if 'v6' in kind or 'trillium' in kind:
        return 918e12
    return 197e12  # conservative default


def compiled_flops(jitted, *args) -> float:
    r"""FLOP count of an already-jitted function from XLA cost analysis
    (0 if the backend does not expose it). Takes the jit wrapper that
    already ran, so the lowering hits the persistent compilation cache
    instead of compiling the program a second time through the tunnel."""

    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get('flops', 0.0))
    except Exception as err:
        log(f'cost analysis unavailable: {err}')
        return 0.0


def bench_sampler(smoke: bool = False):
    r"""Flagship: fused guided Kolmogorov assimilation (coarse scenario)."""

    from sda_tpu.diffusion import GaussianScore, LocalScoreUNet, VPSDE, bind_eps
    from sda_tpu.diffusion.windowed import MCScoreNet
    from sda_tpu.dynamics import coarsen

    if smoke:
        length, steps, corrections, batch, window = 8, 4, 1, 1, 5
        arch = {'hidden_channels': (8, 16), 'hidden_blocks': (1, 1)}
    else:
        length, steps, corrections, batch, window = 32, 256, 1, 4, 5
        arch = {'hidden_channels': (96, 192, 384), 'hidden_blocks': (3, 3, 3)}

    module = LocalScoreUNet(
        channels=window * 2,
        size=64,
        activation=jax.nn.silu,
        **arch,
    )

    # Trained weights when available (storage is gitignored); random init
    # times identically.
    from pathlib import Path

    runpath = Path(__file__).parent / 'experiments/kolmogorov/storage/runs/unet_0'
    if (runpath / 'state.msgpack').exists() and not smoke:
        sys.path.insert(0, str(Path(__file__).parent / 'experiments/kolmogorov'))
        from utils import load_score

        module, params, config = load_score(runpath)
        arch = {
            k: config[k]
            for k in ('embedding', 'hidden_channels', 'hidden_blocks', 'kernel_size')
            if k in config
        }
        weights_provenance = 'trained (unet_0 checkpoint)'
    else:
        params = module.init(
            jax.random.key(0), np.zeros((1, window * 2, 64, 64), np.float32), np.ones(())
        )['params']
        # ADVICE r4: the provenance caveat must live IN the artifact — with
        # random init the residual fields are timing-valid but NOT quality
        # gates, and a consumer of the JSON must be able to see that.
        weights_provenance = 'random-init (residuals are NOT quality gates)'

    # Scenario: 8x coarsen, every 4th frame (figures.ipynb cells 9-10).
    A = lambda x: coarsen(x[..., ::4, :, :, :], 8)
    y = jax.random.normal(jax.random.key(1), (length // 4, 2, 8, 8)) * 0.1

    score = MCScoreNet(bind_eps(module, params), order=window // 2)

    def make_sample(mod):
        score = MCScoreNet(bind_eps(mod, params), order=window // 2)

        def sample(key, y):
            sde = VPSDE(
                eps=GaussianScore(
                    y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
                ),
                shape=(length, 2, 64, 64),
            )
            return sde.sample(
                key, (batch,), steps=steps, corrections=corrections, tau=0.5
            )

        return sample

    sample = make_sample(module)
    fn = jax.jit(sample)
    out = jax.block_until_ready(fn(jax.random.key(2), y))
    assert np.all(np.isfinite(np.asarray(out))), 'sampler produced non-finite states'

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(jax.random.key(3), y))
    t1 = time.perf_counter()
    wall = t1 - t0

    # Opposite-compute-dtype variant. The trained runs carry ``bf16: true``
    # in config.json, so the primary measurement above is ALREADY the
    # bf16-compute module (params and the guidance Tweedie/VJP stay f32,
    # `assimilate.py --bf16` semantics) — the variant then measures f32
    # compute to quantify what bf16 buys. With random init (smoke) the
    # primary is f32 and the variant is bf16. Same analytic FLOPs; the
    # observation residual is the quality gate for both. Guarded: a backend
    # that rejects the variant must not sink the whole benchmark.
    primary_bf16 = module.dtype == jax.numpy.bfloat16
    variant_name = 'f32' if primary_bf16 else 'bf16'
    variant_dtype = None if primary_bf16 else jax.numpy.bfloat16
    wall_v = out_v = None
    try:
        fn_v = jax.jit(make_sample(module.clone(dtype=variant_dtype)))
        out_v = jax.block_until_ready(fn_v(jax.random.key(2), y))
        assert np.all(np.isfinite(np.asarray(out_v))), 'variant sampler non-finite'

        t0 = time.perf_counter()
        out_v = jax.block_until_ready(fn_v(jax.random.key(3), y))
        t1 = time.perf_counter()
        wall_v = t1 - t0
    except Exception as err:
        log(f'{variant_name} sampler variant unavailable: {err}')

    def residual(x):
        return float(jax.numpy.std(A(x.reshape((batch, length, 2, 64, 64))) - y))

    n_evals = steps * (1 + corrections)
    n_windows = length - 2 * (window // 2)

    # Analytic FLOPs of the program (sda_tpu/nn/flops.py; the x2 VJP
    # multiplier is validated in tests/test_flops.py).
    from sda_tpu.nn.flops import guided_sampler_flops, score_unet_flops

    per_window = score_unet_flops(
        channels=window * 2, context_channels=1, size=64, **arch
    )
    flops = guided_sampler_flops(
        per_window, n_windows=n_windows, batch=batch,
        steps=steps, corrections=corrections,
    )

    # Cross-check only: the axon backend's cost analysis does NOT count
    # convolutions (round-2 bug) — kept visible, never used for MFU.
    xla_flops = compiled_flops(fn, jax.random.key(3), y)

    # Per-eval cost of the same guided score (forward + guidance VJP) when
    # launched stand-alone — the reference's structural pattern (one launch
    # per eval with autograd re-entry, sda/score.py:249-261). Same hardware,
    # same kernel: isolates the fusion speedup.
    def one_eval(x, t, y):
        g = GaussianScore(
            y=y, A=A, std=0.1, sde=VPSDE(eps=score, shape=()), gamma=1e-2
        )
        return g(x, t)

    x_probe = out.reshape((batch, length, 2, 64, 64))
    ef = jax.jit(one_eval)
    jax.block_until_ready(ef(x_probe, jax.numpy.float32(0.5), y))
    t2 = time.perf_counter()
    reps = 8
    for i in range(reps):
        jax.block_until_ready(ef(x_probe, jax.numpy.float32(0.5 + 1e-4 * i), y))
    t3 = time.perf_counter()
    t_eval = (t3 - t2) / reps

    # MFU is only meaningful against the matching-dtype peak; the chip's
    # published peak is the bf16 number, so MFU is reported for bf16-compute
    # programs only and f32-compute variants get raw throughput (TFLOP/s)
    # instead (ADVICE r3: dividing an f32 wall by the bf16 peak understates
    # nothing but *means* nothing).
    result = {
        'sampler_wall_s': round(wall, 3),
        'sampler_evals_per_s': round(n_evals / wall, 2),
        'sampler_pflop_analytic': round(flops / 1e15, 3),
        'sampler_tflops': round(flops / wall / 1e12, 1),
        'sampler_mfu_pct': (
            round(100 * flops / wall / chip_peak_flops(), 1)
            if primary_bf16 else None
        ),
        'sampler_tflops_xla_cost': round(xla_flops / wall / 1e12, 2) if xla_flops else None,
        'sampler_unfused_eval_ms': round(1e3 * t_eval, 2),
        'fusion_speedup': round(n_evals * t_eval / wall, 2),
        'sampler_compute_dtype': 'bf16' if primary_bf16 else 'f32',
        'sampler_weights': weights_provenance,
        'sampler_residual': round(residual(out), 4),
    }
    if wall_v is not None:
        result[f'sampler_{variant_name}_wall_s'] = round(wall_v, 3)
        result[f'sampler_{variant_name}_tflops'] = round(flops / wall_v / 1e12, 1)
        if variant_name == 'bf16':
            result['sampler_bf16_mfu_pct'] = round(
                100 * flops / wall_v / chip_peak_flops(), 1
            )
        result[f'sampler_residual_{variant_name}'] = round(residual(out_v), 4)
        wall_f32, wall_bf16 = (wall_v, wall) if primary_bf16 else (wall, wall_v)
        result['bf16_speedup'] = round(wall_f32 / wall_bf16, 2)

    # End-to-end ratio vs the measured torch reference (same scenario,
    # per-eval wall from tools/ref_harness/bench_ref_cpu.py, scaled
    # linearly in windows x batch — both frameworks batch the window axis).
    from pathlib import Path

    ref_json = Path(__file__).parent / 'tools/ref_harness/out/bench_ref_cpu.json'
    if ref_json.exists() and not smoke:
        ref = json.loads(ref_json.read_text())
        ref_eval = ref['ref_per_eval_per_window_batch_s'] * n_windows * batch
        result['ref_cpu_wall_s_extrapolated'] = round(ref_eval * n_evals, 1)
        result['vs_torch_ref_same_host'] = round(ref_eval * n_evals / wall, 1)
        result['framework_speedup_same_host'] = ref['framework_speedup_same_host']
        # The baseline configuration travels WITH the ratio (ADVICE r3
        # medium): what hardware and how many threads the reference ran on.
        result['baseline_hw'] = ref.get(
            'baseline_hw',
            f"this host CPU, torch {ref.get('torch_threads', '?')} thread(s)",
        )

    return result


def bench_train_step(smoke: bool = False):
    r"""One jitted training epoch of the Kolmogorov window U-Net."""

    from sda_tpu.diffusion import LocalScoreUNet, VPSDE
    from sda_tpu.train import TrajectoryDataset, Trainer

    window, batch = 5, 32
    if smoke:
        n, length = 64, 8
        arch = {'hidden_channels': (8, 16), 'hidden_blocks': (1, 1)}
    else:
        n, length = 256, 16  # synthetic stand-in dataset (timing-identical)
        arch = {'hidden_channels': (96, 192, 384), 'hidden_blocks': (3, 3, 3)}

    rng = np.random.RandomState(0)
    data = rng.standard_normal((n, length, 2, 64, 64)).astype(np.float32)

    module = LocalScoreUNet(
        channels=window * 2,
        size=64,
        activation=jax.nn.silu,
        **arch,
    )
    params = module.init(
        jax.random.key(0), np.zeros((1, window * 2, 64, 64), np.float32), np.ones(())
    )['params']

    trainset = TrajectoryDataset(data, window=window, flatten=True)
    validset = TrajectoryDataset(data[:32], window=window, flatten=True)

    # The Trainer donates its parameter buffers to the jitted epoch — give
    # each measured variant its own copy.
    def epoch_wall(mod):
        trainer = Trainer(
            VPSDE(shape=(window * 2, 64, 64)),
            mod, jax.tree_util.tree_map(jax.numpy.copy, params),
            trainset, validset,
            epochs=4096, batch_size=batch, learning_rate=2e-4,
            key=jax.random.key(1),
        )
        trainer.step_epoch()  # compile + warmup
        t0 = time.perf_counter()
        trainer.step_epoch()
        t1 = time.perf_counter()
        return t1 - t0

    steps_per_epoch = len(trainset) // batch
    wall = epoch_wall(module)

    result = {
        'train_steps_per_s': round(steps_per_epoch / wall, 2),
        'train_epoch_wall_s': round(wall, 3),
        'train_epochs_per_h': round(3600 / wall, 1),
    }

    # Production config trains with bf16 network compute (config.json
    # ``bf16: true``) — measure that variant too. Guarded like the sampler
    # variant.
    try:
        wall16 = epoch_wall(module.clone(dtype=jax.numpy.bfloat16))
        result['train_bf16_epoch_wall_s'] = round(wall16, 3)
        result['train_bf16_steps_per_s'] = round(steps_per_epoch / wall16, 2)
    except Exception as err:
        log(f'bf16 train variant unavailable: {err}')

    return result


def bench_datagen(smoke: bool = False):
    r"""256^2 spectral NS trajectory generation (round-1 headline)."""

    from sda_tpu.dynamics import KolmogorovFlow

    size, length, batch = (64, 4, 2) if smoke else (256, 128, 16)
    chain = KolmogorovFlow(size=size, dt=0.2)

    @jax.jit
    def simulate(key):
        k1, k2 = jax.random.split(key)
        x = chain.prior(k1, (batch,))
        return chain.trajectory(k2, x, length=length, last=True)

    final = np.asarray(jax.block_until_ready(simulate(jax.random.key(0))))
    assert np.all(np.isfinite(final)), 'solver produced non-finite states'
    rms = float(np.sqrt((final**2).mean()))
    assert 0.1 < rms < 10.0, f'solver statistics off (rms={rms})'

    t0 = time.perf_counter()
    jax.block_until_ready(simulate(jax.random.key(1)))
    t1 = time.perf_counter()

    per_traj = (t1 - t0) / batch

    return {
        'datagen_traj_per_min': round(60.0 / per_traj, 1),
        'datagen_vs_budget': round(300.0 / per_traj, 1),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--trace', type=str, default=None,
                        help='write a jax.profiler trace of the sampler here')
    parser.add_argument('--smoke', action='store_true',
                        help='tiny shapes (logic check, e.g. on CPU)')
    args = parser.parse_args()

    from sda_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    log('bench: train step ...')
    train = bench_train_step(args.smoke)
    log(f'bench: {train}')

    log('bench: guided sampler (flagship) ...')
    if args.trace:
        from sda_tpu.utils import profile_trace

        with profile_trace(args.trace):
            sampler = bench_sampler(args.smoke)
    else:
        sampler = bench_sampler(args.smoke)
    log(f'bench: {sampler}')

    log('bench: data generation ...')
    datagen = bench_datagen(args.smoke)
    log(f'bench: {datagen}')

    result = {
        'metric': 'kolmogorov_guided_assimilation_wall_s',
        # ADVICE r4: 'value' is pinned to the FLAGSHIP configuration — the
        # trained checkpoint's compute dtype (bf16 in production). The
        # fields below record which program 'value' timed so cross-round
        # comparisons can detect a configuration (not performance) change.
        'schema_version': 2,
        'value': sampler['sampler_wall_s'],
        'value_dtype': sampler['sampler_compute_dtype'],
        'value_weights': sampler['sampler_weights'],
        'unit': (
            'seconds for 4 posterior samples of a (32,2,64,64) trajectory, '
            '256 steps x 1 correction, coarse 8x/4-frame observations, '
            'fused sampler on one chip'
        ),
        # Measured end-to-end ratio vs the unmodified torch reference
        # sampler on this host (its only runtime here — single-thread CPU;
        # per-eval wall measured at the production architecture, scaled
        # linearly in windows x batch). Falls back to the same-chip fusion
        # speedup (a strict lower bound) when the reference measurement is
        # absent. See module docstring for why each ratio is what it is.
        'vs_baseline': sampler.get(
            'vs_torch_ref_same_host', sampler['fusion_speedup']
        ),
        'vs_baseline_desc': (
            'end-to-end wall ratio vs the unmodified torch reference sampler '
            'on ' + sampler.get(
                'baseline_hw',
                'the same chip (fusion speedup: one-launch-per-eval vs '
                'fused; reference CPU measurement absent)',
            )
            + '; per-eval wall measured at the production architecture, '
            'scaled linearly in windows x batch. The reference has no GPU '
            'available in this environment — see fusion_speedup and '
            'sampler_mfu_pct for the hardware-independent structural/'
            'efficiency numbers.'
        ),
        **sampler,
        **train,
        **datagen,
    }

    print(json.dumps(result))


if __name__ == '__main__':
    main()
