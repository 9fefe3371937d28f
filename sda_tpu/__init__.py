r"""sda_tpu — a TPU-native framework for Score-based Data Assimilation.

A from-scratch JAX/XLA/pjit/Pallas re-design with the capabilities of the
reference implementation of *Score-based Data Assimilation* (Rozet & Louppe,
NeurIPS 2023): dynamical-system simulators, windowed score-based generative
models of state trajectories, a fully on-device training runtime, and
zero-shot posterior assimilation with the entire guided reverse-diffusion
loop fused into a single XLA program.
"""

__version__ = '0.1.0'

from . import diffusion, dynamics, eval, nn, parallel, train, utils  # noqa: F401
