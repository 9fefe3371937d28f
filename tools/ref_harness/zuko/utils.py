import torch


def broadcast(*tensors, ignore: int = 0):
    r"""Broadcasts tensors to a common shape, ignoring the last `ignore`
    dimensions of each (zuko 0.1.4 semantics)."""

    if isinstance(ignore, int):
        ignore = [ignore] * len(tensors)

    dims = [t.dim() - i for t, i in zip(tensors, ignore)]
    common = torch.broadcast_shapes(*(t.shape[:d] for t, d in zip(tensors, dims)))

    return [
        torch.broadcast_to(t, common + t.shape[d:])
        for t, d in zip(tensors, dims)
    ]
