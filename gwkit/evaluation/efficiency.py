"""Detection-efficiency estimation (TAP vs SNR at fixed FAPs).

Parity with EfficiencyEstimator (Efficiency_test/src/tools.py:334-369):
noise-only outputs define per-FAP thresholds (the k-th largest noise score
with k = FAP * N_noise); per-SNR waveform batches are scored at fixed SNR
and the detected fraction above each threshold is the efficiency.

TPU design: the scorer is one jit program; the SNR is a traced scalar so the
whole (snr x fap) sweep reuses a single compiled executable. Also provides
the text-table writer matching the reference's efficiencies output files
(Efficiency_test/src/efficiencies/out_efficiencies_run_*.txt).
"""
from __future__ import annotations

import logging
from typing import Callable, Sequence

import jax
import numpy as np


class EfficiencyEstimator:
    """``score_fn(x_batch) -> signal scores``; datasets are
    gwkit.data.datasets.PartitionedDataset/InjectionDataset-like objects with
    .snrs() and .sample_batch()."""

    def __init__(
        self,
        wave_dataset,
        noise_dataset,
        snrs: Sequence[float],
        batch_size: int = 16,
        faps: Sequence[float] = (1e-2, 1e-3, 1e-4),
    ):
        self.wave_dataset = wave_dataset
        self.noise_dataset = noise_dataset
        self.snrs = list(snrs)
        self.batch_size = batch_size
        self.faps = list(faps)

    def _collect_scores(self, dataset, score_fn, key) -> np.ndarray:
        scores = []
        for batch in dataset.batches(key, self.batch_size, shuffle=False, drop_remainder=False):
            scores.append(np.asarray(score_fn(batch[0])).reshape(-1))
        # the final batch is wrap-padded to a static shape — trim the
        # duplicates so FAP thresholds are quantiles of each sample ONCE
        return np.concatenate(scores)[: len(dataset)]

    def __call__(self, score_fn: Callable, seed: int = 0) -> np.ndarray:
        """Returns efficiencies of shape (len(snrs), len(faps))."""
        key = jax.random.PRNGKey(seed)
        self.noise_dataset.snrs((0.0, 0.0))
        noise_scores = np.sort(self._collect_scores(self.noise_dataset, score_fn, key))
        n_noise = len(self.noise_dataset)
        counts = (np.asarray(self.faps) * n_noise).astype(int)
        thresholds = np.array([noise_scores[-max(c, 1)] for c in counts])
        logging.info("efficiency thresholds at FAPs %s: %s", self.faps, thresholds)

        rows = []
        for snr in self.snrs:
            self.wave_dataset.snrs((snr, snr))
            wave_scores = self._collect_scores(self.wave_dataset, score_fn, key)
            rows.append((wave_scores[:, None] > thresholds[None, :]).mean(axis=0))
        return np.stack(rows, axis=0)


def write_efficiency_table(path: str, snrs, faps, efficiencies: np.ndarray) -> None:
    """Text table matching the reference's out_efficiencies_*.txt layout:
    header row of FAPs, then one row per SNR."""
    with open(path, "w") as f:
        f.write("# SNR\t" + "\t".join(f"FAP={fap:g}" for fap in faps) + "\n")
        for snr, row in zip(snrs, efficiencies):
            f.write(f"{snr:g}\t" + "\t".join(f"{v:.6f}" for v in row) + "\n")
