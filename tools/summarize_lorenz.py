#!/usr/bin/env python
r"""Derive the README Lorenz ablation table from the committed stats CSVs.

Reads ``experiments/lorenz/storage/results/stats_{lo,hi}.csv`` (schema:
``index,run,corrections,log_prior,log_likelihood,w1`` — the reference's
CSV accumulation, ``/root/reference/experiments/lorenz/eval.py:65,91``) and
prints per-(model, corrections) median W1 and the BPF-vs-BPF floor, as a
markdown table. The README numbers must be reproducible with::

    python tools/summarize_lorenz.py lo

Rows are deduped on (index, run, corrections) keeping the last occurrence
(idempotent re-runs append).
"""

import csv
import statistics
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def load(freq: str):
    path = REPO / f'experiments/lorenz/storage/results/stats_{freq}.csv'
    rows = {}
    with open(path) as f:
        for r in csv.reader(f):
            if len(r) != 6:
                continue
            rows[(r[0], r[1], r[2])] = r
    return list(rows.values())


def main(freq: str = 'lo'):
    rows = load(freq)

    w1 = defaultdict(list)      # (run, C) -> [w1]
    prior = defaultdict(list)   # (run, C) -> [log_prior]
    floor, gt_prior = [], []
    indices = defaultdict(set)

    for idx, run, c, lp, _, w in rows:
        if run == 'ground-truth':
            floor.append(float(w))
            gt_prior.append(float(lp))
        else:
            w1[(run, c)].append(float(w))
            prior[(run, c)].append(float(lp))
            indices[run].add(idx)

    print(f'# stats_{freq}.csv: {len(rows)} unique rows, '
          f'BPF floor (median W1 BPF-vs-BPF over {len(floor)} indices): '
          f'{statistics.median(floor):.2f}, '
          f'GT log-prior {statistics.median(gt_prior):.1f}')
    runs = sorted(indices)
    cs = sorted({int(c) for r, c in w1}, key=int)
    header = '| model (indices) | ' + ' | '.join(f'C={c}' for c in cs)
    header += ' | log-prior @C=max |'
    print(header)
    print('|' + '---|' * (len(cs) + 2))
    for run in runs:
        cells = []
        for c in cs:
            vals = w1.get((run, str(c)), [])
            cells.append(f'{statistics.median(vals):.1f}' if vals else '—')
        cmax = max((c for r, c in w1 if r == run), key=int)
        lp = statistics.median(prior[(run, cmax)])
        print(f'| {run} ({len(indices[run])}) | ' + ' | '.join(cells)
              + f' | {lp:.1f} (C={cmax}) |')


def seeds(freq: str = 'lo', c: str = '8'):
    """Median-W1 seed spread at a fixed correction count: mean +/- stdev of
    the per-seed medians over families with >=2 trained seeds (the README's
    '+/-' numbers, reference trains 3 seeds — experiments/lorenz/train.py:47).
    """
    rows = load(freq)
    w1 = defaultdict(lambda: defaultdict(list))  # family -> seed -> [w1]
    for idx, run, cc, lp, _, w in rows:
        if run == 'ground-truth' or cc != c:
            continue
        family, _, seed = run.rpartition('_')
        w1[family][seed].append(float(w))
    print(f'# seed spread, {freq}, C={c} (per-seed median W1 over indices)')
    for family in sorted(w1):
        meds = {s: statistics.median(v) for s, v in sorted(w1[family].items())}
        line = f'{family}: ' + ', '.join(
            f'seed {s}: {m:.2f} (n={len(w1[family][s])})' for s, m in meds.items())
        if len(meds) >= 2:
            vals = list(meds.values())
            line += (f'  ->  {statistics.mean(vals):.2f} '
                     f'+/- {statistics.stdev(vals):.2f}')
        print(line)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'seeds':
        seeds(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
