r"""Diffusion engine: SDEs, samplers, guidance, windowed score composition."""

from .guidance import DPSGaussianScore, GaussianScore  # noqa: F401
from .scorenet import LocalScoreUNet, ScoreNet, ScoreUNet, bind_eps  # noqa: F401
from .sde import SubSubVPSDE, SubVPSDE, VPSDE, make_alpha  # noqa: F401
from .windowed import MCScoreNet, MCScoreWrapper, fold, unfold  # noqa: F401
