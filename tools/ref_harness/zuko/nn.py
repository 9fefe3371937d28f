import torch
import torch.nn as nn


class LayerNorm(nn.Module):
    r"""Non-learnable standardization along a dimension (zuko 0.1.4 semantics:
    no affine parameters)."""

    def __init__(self, dim: int = -1, eps: float = 1e-5):
        super().__init__()
        self.dim = dim
        self.eps = eps

    def forward(self, x):
        mean = x.mean(dim=self.dim, keepdim=True)
        var = x.var(dim=self.dim, unbiased=False, keepdim=True)
        return (x - mean) / torch.sqrt(var + self.eps)
