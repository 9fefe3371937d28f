r"""TPU-native hot ops: spectral transforms and fused kernels."""

from .pallas_dft import pallas_irfft2, pallas_rfft2  # noqa: F401
from .spectral import RealDFT2, default_dft_method  # noqa: F401
