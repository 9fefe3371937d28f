r"""Weight transfer between the reference torch ScoreNet kernel and our flax
ScoreNet (diagnostic). Both are architecturally identical (VERDICT parity
audit), so the mapping is a rename + transpose:

torch (enumeration order)          flax
 embedding.0 / embedding.2     ->  TimeEmbedding_0/Dense_0, Dense_1
 network.<i> Linear layers     ->  ResMLP_0/Dense_0 .. Dense_{N-1}
                                   (same creation order)
"""

import numpy as np


def torch_kernel_to_flax(state_dict):
    r"""Maps the reference local kernel state_dict (possibly with a
    ``kernel.`` prefix from MCScoreNet) to our flax ScoreNet params."""

    sd = {
        k.removeprefix('kernel.'): v.detach().cpu().numpy()
        for k, v in state_dict.items()
    }

    emb = [k for k in sd if k.startswith('embedding.') and k.endswith('.weight')]
    net = [k for k in sd if k.startswith('network.') and k.endswith('.weight')]

    # Sort by the torch Sequential indices (numeric, possibly nested).
    def order(k):
        return tuple(int(p) for p in k.split('.')[1:-1])

    emb.sort(key=order)
    net.sort(key=order)

    def dense(k):
        return {
            'kernel': np.ascontiguousarray(sd[k].T),
            'bias': sd[k.replace('.weight', '.bias')],
        }

    return {
        'TimeEmbedding_0': {f'Dense_{i}': dense(k) for i, k in enumerate(emb)},
        'ResMLP_0': {f'Dense_{i}': dense(k) for i, k in enumerate(net)},
    }


def flax_to_torch_kernel(params, prefix='kernel.'):
    r"""Inverse mapping: our flax ScoreNet params -> reference state_dict
    (numpy values; caller wraps in torch tensors).

    The torch Sequential layout for ResMLP(47, [256]*5, 15) is:
    network.0 Linear, network.1 RB(.1/.3), network.2-5 RB(.1/.3),
    network.6 Linear, network.7 RB(.1/.3) — a width-changing Linear occupies
    its own index; each residual block holds Linears at sub-indices 1 and 3.
    """

    out = {}

    emb = params['TimeEmbedding_0']
    out['embedding.0'] = emb['Dense_0']
    out['embedding.2'] = emb['Dense_1']

    net = params['ResMLP_0']
    denses = [net[f'Dense_{i}'] for i in range(len(net))]

    i, idx = 0, 0
    while i < len(denses):
        k = denses[i]['kernel']
        if k.shape[0] != k.shape[1]:  # width-changing Linear
            out[f'network.{idx}'] = denses[i]
            i += 1
            idx += 1
        out[f'network.{idx}.1'] = denses[i]
        out[f'network.{idx}.3'] = denses[i + 1]
        i += 2
        idx += 1

    sd = {}
    for stem, d in out.items():
        sd[f'{prefix}{stem}.weight'] = np.ascontiguousarray(d['kernel'].T)
        sd[f'{prefix}{stem}.bias'] = np.asarray(d['bias'])

    sd[f'{prefix}embedding.freqs'] = np.pi * np.arange(1, 17, dtype=np.float32)

    return sd
