"""Bulk file scorer with resume-from-log.

Parity with Efficiency_test/src/test_network.py:63-160: iterate over a list
of HDF5 strain files, score each in fixed-size chunks (resample -> mel ->
model, all on device here), optionally swap the softmax for the fixed
[[1,-1],[-1,1]] "USR" linear (subtraction ranking), and append to a results
file; files already listed in the log are skipped on restart (the
reference's failure-recovery mechanism, SURVEY.md §5).
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional

import h5py
import jax
import numpy as np

USR_MATRIX = np.array([[1.0, -1.0], [-1.0, 1.0]], dtype=np.float32)


def usr_scores(probs_or_logits: np.ndarray) -> np.ndarray:
    """Apply the subtraction layer: (N,2) -> (N,2) @ [[1,-1],[-1,1]];
    column 0 is the ranking statistic (calculate_efficiencies.py USR mode)."""
    return np.asarray(probs_or_logits) @ USR_MATRIX


def score_files(
    task,
    files: List[str],
    output_path: str,
    log_path: Optional[str] = None,
    dataset_key: str = "data/0",
    chunk: int = 16,
    usr: bool = True,
    trainable=None,
) -> None:
    """Score every file's [N, T] strain array; write per-file score datasets;
    skip files already in the log."""
    trainable = trainable if trainable is not None else task.trainable
    log_path = log_path or output_path + ".log"
    done = set()
    if os.path.isfile(log_path):
        with open(log_path) as f:
            done = {line.strip() for line in f if line.strip()}

    @jax.jit
    def score_fn(x):
        return task.forward(trainable, task.frozen, x)

    with open(log_path, "a", buffering=1) as log:
        for path in files:
            name = os.path.basename(path)
            if name in done:
                logging.info("skipping %s (already scored)", name)
                continue
            with h5py.File(path, "r") as f:
                data = f[dataset_key][()]
            outs = []
            for s in range(0, len(data), chunk):
                batch = np.asarray(data[s : s + chunk], np.float32)
                if len(batch) < chunk:  # pad to the compiled shape
                    pad = chunk - len(batch)
                    batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
                    out = np.asarray(score_fn(batch))[: chunk - pad]
                else:
                    out = np.asarray(score_fn(batch))
                outs.append(out)
            scores = np.concatenate(outs) if outs else np.zeros((0, 2), np.float32)
            if usr and scores.ndim == 2 and scores.shape[1] == 2:
                scores = usr_scores(scores)
            with h5py.File(output_path, "a") as out_f:
                if name in out_f:
                    del out_f[name]
                out_f.create_dataset(name, data=scores)
            log.write(name + "\n")
            logging.info("scored %s: %s", name, scores.shape)
