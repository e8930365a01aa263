"""Training metrics sinks: TSV scalars (always) + TensorBoard (if available).

Replaces the reference's SummaryWriter usage (Signal_vs_Noise/src/train.py:
186-188 writes train/val loss + AUC/F1 scalars) and its losses.txt files.
"""
from __future__ import annotations

import os
from typing import Dict


class MetricsWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.tsv_path = os.path.join(logdir, "scalars.tsv")
        self._tsv = open(self.tsv_path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def __call__(self, step: int, metrics: Dict[str, float]) -> None:
        for key, val in metrics.items():
            self._tsv.write(f"{step}\t{key}\t{val}\n")
            if self._tb is not None:
                self._tb.add_scalar(key, val, step)

    def close(self) -> None:
        self._tsv.close()
        if self._tb is not None:
            self._tb.close()
