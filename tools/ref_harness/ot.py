r"""Minimal stub of POT's `ot.emd2` for the diagnostic harness (uniform
weights, equal sample counts -> exact W1 via the linear assignment problem)."""

import torch
from scipy.optimize import linear_sum_assignment


def emd2(a, b, M):
    assert M.shape[0] == M.shape[1], 'stub supports equal sample counts only'
    cost = M.detach().cpu().numpy()
    i, j = linear_sum_assignment(cost)
    return torch.as_tensor(cost[i, j].mean())
