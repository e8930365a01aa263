"""Real-event scoring: GWTC catalog events through the two-channel model.

Parity with Signal_vs_Noise/Real_events (preprocess_real_events.py:12-84 +
evaluation_real_events.py:29-99): long strain around a catalog event is cut
into overlapping windows (window 2048 samples @2048 Hz, step 204 = 0.1 s),
each window resampled to 16 kHz and scored by the two-channel classifier;
per-event sigmoid score series are written to HDF5.

TPU design: windows are gathered and scored on device in one jit program per
event (the reference feature-extracts per window on CPU).
"""
from __future__ import annotations

import logging
from typing import Dict

import h5py
import jax
import numpy as np

from gwkit.search.slicer import DeviceSlicer, Segment, SlicerConfig


def score_event_segments(
    task,
    events: Dict[str, np.ndarray],
    sample_rate: float = 2048.0,
    window: int = 2048,
    step: int = 204,
    batch_size: int = 64,
    trainable=None,
    white: bool = True,
) -> Dict[str, np.ndarray]:
    """``events``: {event_name: strain (2, N)} (already whitened unless
    white=False). Returns {event_name: sigmoid scores per window}."""
    trainable = trainable if trainable is not None else task.trainable
    frozen = task.frozen

    @jax.jit
    def score_fn(windows):  # (B, 2, window)
        logits = task.forward(trainable, frozen, windows)
        return jax.nn.sigmoid(logits.reshape(-1))

    out: Dict[str, np.ndarray] = {}
    cfg = SlicerConfig(
        step_size=step / sample_rate, slice_length=window, batch_size=batch_size,
        peak_offset=0.0,
    )
    for name, strain in events.items():
        seg = Segment(key=name, strain=np.asarray(strain), start_time=0.0, delta_t=1.0 / sample_rate)
        slicer = DeviceSlicer(seg, cfg, white=white)
        scores = []
        for windows, _, valid in slicer.batches():
            s = np.asarray(score_fn(windows)).reshape(-1)[: len(valid)]
            scores.append(s[valid])
        out[name] = np.concatenate(scores) if scores else np.zeros(0, np.float32)
        logging.info("event %s: %d windows, max score %.4f", name, len(out[name]),
                     out[name].max() if len(out[name]) else float("nan"))
    return out


def write_event_scores(path: str, scores: Dict[str, np.ndarray]) -> None:
    """HDF5 layout of results_2_detectors_real_events.hdf: one dataset per event."""
    with h5py.File(path, "w") as f:
        for name, vals in scores.items():
            f.create_dataset(name, data=np.asarray(vals, np.float32))
