r"""Neural-network primitives."""

from .layers import ResMLP, TimeEmbedding, layer_norm  # noqa: F401
from .unet import ModResidualBlock, UNet  # noqa: F401
