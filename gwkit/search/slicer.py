"""Segment reading + device-resident sliding-window slicing.

Replaces SegmentSlicer/TorchSegmentSlicer (MLGWSC-1/inference.py:173-296).
The reference whitens on CPU worker processes and hands 10^6-sample chunks
through an mp.Manager dict; here the raw segment is transferred to device
once, whitened there (gwkit.ops.whiten.whiten_estimate), and windows are
*gathered on device* per batch — each strain sample crosses PCIe exactly
once and no window is ever materialized host-side.

Window geometry parity: slice_length 2048 (1 s @ 2048 Hz), step 0.1 s
(index step = int(0.1/delta_t)), trigger time = slice start + peak_offset
0.6 s, whitening crop advances start_time by 0.125 s (inference.py:244-246).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, List, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from gwkit.ops.whiten import whiten_estimate


@dataclasses.dataclass
class Segment:
    """One contiguous multi-detector strain segment."""

    key: str
    strain: np.ndarray  # (D, N) raw or whitened
    start_time: float
    delta_t: float
    white: bool = False


def read_segments(
    path: str, detectors: Optional[List[str]] = None
) -> List[Segment]:
    """Load every segment of an MLGWSC-style HDF5 file
    ({detector: {key: dataset(attrs: start_time, delta_t)}}).

    Contiguous uncompressed datasets stream through the native C++
    double-buffered reader (f64->f32 off the Python thread,
    gwkit.native.hostio); others fall back to h5py."""
    from gwkit.native.hostio import read_contiguous_dataset

    segments = []
    with h5py.File(path, "r") as f:
        dets = detectors or sorted(f.keys())
        keys = list(f[dets[0]].keys())
        for key in keys:
            dss = [f[det][key] for det in dets]
            start = dss[0].attrs["start_time"]
            delta_t = 1.0 / (1.0 / dss[0].attrs["delta_t"])
            rows = []
            for ds in dss:
                assert ds.attrs["start_time"] == start
                native = read_contiguous_dataset(path, ds)
                rows.append(native if native is not None else ds[()].astype(np.float32))
            segments.append(
                Segment(key=key, strain=np.stack(rows), start_time=float(start), delta_t=float(delta_t))
            )
    # longest first, like the reference (inference.py:546) — keeps the device
    # busy on big segments while short ones amortize
    segments.sort(key=lambda s: s.strain.shape[1], reverse=True)
    return segments


@dataclasses.dataclass
class SlicerConfig:
    step_size: float = 0.1
    peak_offset: float = 0.6
    slice_length: int = 2048
    low_frequency_cutoff: Optional[float] = 20.0
    segment_duration: float = 0.5
    max_filter_duration: float = 0.25
    batch_size: int = 256


class DeviceSlicer:
    """Whiten a segment on device and yield batched windows.

    Yields (windows (B, D, slice_length) device array, times (B,) numpy,
    valid (B,) numpy bool) — the final batch is wrap-padded to keep shapes
    static; `valid` masks the padding.
    """

    def __init__(self, segment: Segment, cfg: SlicerConfig = SlicerConfig(), white: bool = False):
        self.cfg = cfg
        self.key = segment.key
        self.delta_t = segment.delta_t
        self.index_step = int(cfg.step_size / segment.delta_t)
        self.time_step = segment.delta_t * self.index_step
        strain = jnp.asarray(segment.strain, jnp.float32)
        if white or segment.white:
            self.dss = strain
            self.start_time = segment.start_time
        else:
            self.dss = whiten_estimate(
                strain,
                delta_t=segment.delta_t,
                segment_duration=cfg.segment_duration,
                max_filter_duration=cfg.max_filter_duration,
                low_frequency_cutoff=cfg.low_frequency_cutoff,
            )
            # whitening discards max_filter_len//2 per side (0.125 s at 2048 Hz)
            self.start_time = segment.start_time + 0.125
        n = self.dss.shape[1]
        self.n_windows = max(0, 1 + (n - cfg.slice_length) // self.index_step)
        logging.debug("DeviceSlicer %s: %d windows", self.key, self.n_windows)

    def __len__(self) -> int:
        return self.n_windows

    def window_times(self) -> np.ndarray:
        return self.start_time + np.arange(self.n_windows) * self.time_step + self.cfg.peak_offset

    def batches(self) -> Iterator[Tuple[jnp.ndarray, np.ndarray, np.ndarray]]:
        b = self.cfg.batch_size
        times = self.window_times()
        for s in range(0, self.n_windows, b):
            idx = np.arange(s, min(s + b, self.n_windows))
            valid = np.ones(len(idx), bool)
            if len(idx) < b:
                pad = b - len(idx)
                idx = np.pad(idx, (0, pad), mode="wrap")
                valid = np.pad(valid, (0, pad))
            windows = _gather_windows(
                self.dss, jnp.asarray(idx * self.index_step), self.cfg.slice_length
            )
            yield windows, times[idx], valid


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _gather_windows(dss: jnp.ndarray, starts: jnp.ndarray, slice_length: int) -> jnp.ndarray:
    """(D, N), (B,) -> (B, D, slice_length) on-device window gather."""
    offs = jnp.arange(slice_length)
    idx = starts[:, None] + offs[None, :]  # (B, L)
    return jnp.swapaxes(dss[:, idx], 0, 1)
