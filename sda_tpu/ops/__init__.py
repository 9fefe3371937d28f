r"""TPU-native hot ops: spectral transforms and fused kernels."""

from .spectral import RealDFT2, default_dft_method  # noqa: F401
