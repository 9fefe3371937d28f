r"""Experiment tracking: JSONL/CSV metric logging with optional wandb.

Replaces the reference's hard wandb dependency
(``experiments/lorenz/train.py:49-51``, ``experiments/kolmogorov/train.py:35-37``)
with a pluggable local-first logger that keeps the same per-epoch schema
``{loss_train, loss_valid, lr}``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class RunLogger:
    r"""Append-only JSONL metric logger for a run directory.

    Arguments:
        path: The run directory.
        use_wandb: Attempt to mirror metrics to Weights & Biases (silently
            disabled if wandb is unavailable or not configured).
        project / group / config: wandb metadata.
    """

    def __init__(
        self,
        path: Path,
        use_wandb: bool = False,
        project: Optional[str] = None,
        group: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
    ):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = open(self.path / 'metrics.jsonl', mode='a')
        self.t0 = time.time()

        self.wandb_run = None
        if use_wandb:
            try:
                import wandb

                self.wandb_run = wandb.init(
                    project=project, group=group, config=config
                )
            except Exception:
                self.wandb_run = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {'time': time.time() - self.t0, **metrics}
        if step is not None:
            record['step'] = step

        self.file.write(json.dumps(record) + '\n')
        self.file.flush()

        if self.wandb_run is not None:
            self.wandb_run.log(metrics, step=step)

    def finish(self) -> None:
        self.file.close()

        if self.wandb_run is not None:
            self.wandb_run.finish()


def append_csv(path: Path, row: str) -> None:
    r"""Appends one line to a CSV results file (reference
    ``experiments/lorenz/eval.py:65-66,91-92`` accumulation pattern)."""

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    with open(path, mode='a') as f:
        f.write(row.rstrip('\n') + '\n')


def existing_csv_keys(path: Path, columns: int) -> set:
    r"""Key tuples (the first ``columns`` comma-separated fields) of the rows
    already in an :func:`append_csv` results file.

    The idempotent-resume pattern shared by the eval CLIs: a run is skipped
    when its key tuple is present, so re-running a crashed sweep resumes
    where it stopped (supersedes the reference's dawgz ``@ensure``,
    ``experiments/lorenz/eval.py:99-108``)."""

    path = Path(path)
    keys = set()
    if path.exists():
        for line in path.read_text().splitlines():
            parts = line.split(',')
            if len(parts) >= columns:
                keys.add(tuple(parts[:columns]))
    return keys
