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
    path: str, detectors: Optional[List[str]] = None, key_filter=None
) -> List[Segment]:
    """Load every segment of an MLGWSC-style HDF5 file
    ({detector: {key: dataset(attrs: start_time, delta_t)}}).

    Keys are enumerated longest-first, like the reference (inference.py:546)
    — keeps the device busy on big segments while short ones amortize.
    ``key_filter(i, key)`` (over that order) selects a subset BEFORE any
    dataset is read — this is how multi-host search shards segments without
    each host touching the others' data.

    Contiguous uncompressed datasets stream through the native C++
    double-buffered reader (f64->f32 off the Python thread,
    gwkit.native.hostio); others fall back to h5py."""
    from gwkit.native.hostio import read_contiguous_dataset

    segments = []
    with h5py.File(path, "r") as f:
        dets = detectors or sorted(f.keys())
        keys = sorted(f[dets[0]].keys(), key=lambda k: f[dets[0]][k].shape[0], reverse=True)
        if key_filter is not None:
            keys = [k for i, k in enumerate(keys) if key_filter(i, k)]
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
    return segments


def native_streamable(path: str, detectors: Optional[List[str]] = None) -> bool:
    """True when every dataset of the file can go through the C++ prefetch
    path (contiguous uncompressed f64/f32 and the native library builds)."""
    from gwkit.native.hostio import available, dataset_prefetch_meta

    if not available():
        return False
    with h5py.File(path, "r") as f:
        dets = detectors or sorted(f.keys())
        # verify key sets match across detectors (a detector missing a key
        # is "not streamable", not a KeyError), then probe each detector's
        # own datasets
        keysets = [set(f[det].keys()) for det in dets]
        if any(ks != keysets[0] for ks in keysets[1:]):
            return False
        return all(
            dataset_prefetch_meta(f[det][key]) is not None
            for det in dets for key in keysets[0]
        )


def stream_segments(
    path: str, detectors: Optional[List[str]] = None, prefetch: int = 1,
    key_filter=None,
) -> Iterator[Segment]:
    """Yield the file's Segments longest-first while the NEXT segment is read
    ahead in the background.

    ``key_filter(i, key)`` over the longest-first key order selects a subset
    before any read is issued — under jax.distributed each host passes its
    round-robin filter so it only ever opens (and prefetches) its own share;
    filtering the yielded stream instead would make every host read the whole
    file (ADVICE r2).

    Fast path: when every dataset is contiguous uncompressed f64/f32 and the
    native library is built, segment i+1 is read by a C++ thread
    (gwkit.native.hostio.ArrayPrefetch — zero GIL contention, f64->f32
    converted in the reader) while the device scores segment i. Otherwise a
    Python h5py reader thread provides the same contents/order.
    """
    import queue
    import threading

    from gwkit.native.hostio import ArrayPrefetch, available, dataset_prefetch_meta

    metas = []
    with h5py.File(path, "r") as f:
        dets = detectors or sorted(f.keys())
        keys = sorted(f[dets[0]].keys(), key=lambda k: f[dets[0]][k].shape[0], reverse=True)
        if key_filter is not None:
            keys = [k for i, k in enumerate(keys) if key_filter(i, k)]
        for key in keys:
            dss = [f[det][key] for det in dets]
            start = dss[0].attrs["start_time"]
            for ds in dss:
                assert ds.attrs["start_time"] == start
            metas.append((key, float(start), float(dss[0].attrs["delta_t"]),
                          [dataset_prefetch_meta(ds) for ds in dss]))

    if available() and all(m is not None for _, _, _, ms in metas for m in ms):
        inflight = {}

        def issue(idx):
            inflight[idx] = [ArrayPrefetch(path, *m) for m in metas[idx][3]]

        if metas:
            issue(0)
        for i, (key, start, delta_t, _) in enumerate(metas):
            for j in range(i + 1, min(i + 1 + max(1, prefetch), len(metas))):
                if j not in inflight:
                    issue(j)
            rows = [p.wait() for p in inflight.pop(i)]
            yield Segment(key=key, strain=np.stack(rows), start_time=start, delta_t=delta_t)
        return

    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))

    def reader():
        from gwkit.native.hostio import read_contiguous_dataset

        try:
            with h5py.File(path, "r") as f:
                for key in keys:
                    dss = [f[det][key] for det in dets]
                    start = dss[0].attrs["start_time"]
                    delta_t = float(dss[0].attrs["delta_t"])
                    rows = []
                    for ds in dss:
                        assert ds.attrs["start_time"] == start
                        native = read_contiguous_dataset(path, ds)
                        rows.append(native if native is not None else ds[()].astype(np.float32))
                    q.put(Segment(key=key, strain=np.stack(rows),
                                  start_time=float(start), delta_t=delta_t))
        except BaseException as e:  # surface reader failures at the consumer
            q.put(e)
        else:
            q.put(None)

    threading.Thread(target=reader, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


@dataclasses.dataclass
class SlicerConfig:
    step_size: float = 0.1
    peak_offset: float = 0.6
    slice_length: int = 2048
    low_frequency_cutoff: Optional[float] = 20.0
    segment_duration: float = 0.5
    max_filter_duration: float = 0.25
    batch_size: int = 128  # fastest measured scoring batch (docs/PERF.md)
    # raw samples per whitening block; segments longer than this whiten and
    # window in fixed-size blocks (tests shrink it to force the blocked path)
    max_block: int = 1 << 19


class DeviceSlicer:
    """Whiten a segment on device and yield batched windows.

    Yields (windows (B, D, slice_length) device array, times (B,) numpy,
    valid (B,) numpy bool) — the final batch is wrap-padded to keep shapes
    static; `valid` masks the padding.

    Month-scale segments: raw strain longer than ``max_block`` samples is
    whitened and windowed in fixed-size blocks (one compiled shape, bounded
    HBM; hour-long FFTs also crash this TPU compiler). Block starts are
    chosen so the global window stride is EXACTLY preserved: whitened-global
    sample g corresponds to raw sample g + mfl/2, so a block at raw start
    r_b serves windows g in [r_b, r_b + Wb - L] at local offset g - r_b.
    The only semantic difference from unsplit whitening is that the Welch
    PSD is estimated per 256 s block instead of per segment (the estimate is
    windowed either way).
    """

    def __init__(
        self,
        segment: Segment,
        cfg: SlicerConfig = SlicerConfig(),
        white: bool = False,
        max_block: Optional[int] = None,
    ):
        max_block = max_block if max_block is not None else cfg.max_block
        self.cfg = cfg
        self.key = segment.key
        self.delta_t = segment.delta_t
        self.index_step = int(cfg.step_size / segment.delta_t)
        self.time_step = segment.delta_t * self.index_step
        self.white = bool(white or segment.white)
        sample_rate = 1.0 / segment.delta_t
        mfl = 0 if self.white else int(cfg.max_filter_duration * sample_rate)
        self.half = mfl // 2
        self.start_time = segment.start_time + self.half * segment.delta_t

        n_raw = segment.strain.shape[1]
        self.n_white_total = n_raw - 2 * self.half
        self.n_windows = max(0, 1 + (self.n_white_total - cfg.slice_length) // self.index_step)

        self._blocked = n_raw > max_block
        if not self._blocked:
            self.dss = self._whiten(jnp.asarray(segment.strain, jnp.float32))
            self._raw = None
        else:
            self.dss = None
            self._raw = np.asarray(segment.strain, np.float32)
            self.block_raw = max_block
            wb = self.block_raw - 2 * self.half  # whitened samples per block
            self.wins_per_block = (wb - cfg.slice_length) // self.index_step + 1
        logging.debug("DeviceSlicer %s: %d windows (blocked=%s)", self.key, self.n_windows, self._blocked)

    def _whiten(self, strain: jnp.ndarray) -> jnp.ndarray:
        if self.white:
            return strain
        # One fused program: whiten_estimate is ~50 ops, and eager per-op
        # dispatch is expensive on remote-attached TPUs; jit caches per
        # (shape, geometry) so every same-size block reuses the executable.
        return _whiten_jit(
            strain,
            self.delta_t,
            self.cfg.segment_duration,
            self.cfg.max_filter_duration,
            self.cfg.low_frequency_cutoff,
        )

    def __len__(self) -> int:
        return self.n_windows

    def window_times(self) -> np.ndarray:
        return self.start_time + np.arange(self.n_windows) * self.time_step + self.cfg.peak_offset

    def _batched(self, widxs: np.ndarray, local_starts: np.ndarray, dss, times):
        b = self.cfg.batch_size
        for s in range(0, len(widxs), b):
            idx = np.arange(s, min(s + b, len(widxs)))
            valid = np.ones(len(idx), bool)
            if len(idx) < b:
                pad = b - len(idx)
                idx = np.pad(idx, (0, pad), mode="wrap")
                valid = np.pad(valid, (0, pad))
            windows = _gather_windows(dss, jnp.asarray(local_starts[idx]), self.cfg.slice_length)
            yield windows, times[widxs[idx]], valid

    def fused_scores(self, score_fn) -> Iterator[Tuple[jnp.ndarray, np.ndarray, np.ndarray]]:
        """Yield (scores (n_batches, B) device array, times, valid) per
        whitening block with whiten + window gather + EVERY batch's forward
        fused into one jit dispatch (lax.scan over the batch axis).

        On tunneled/remote-attached TPUs the per-dispatch RPC round trip —
        not device time — dominates the month-scale real-file search
        (docs/PERF.md lever 5); this path issues ONE dispatch per 256 s
        block instead of ~25 (whiten + per-batch gathers + scores). Only
        blocked (long) segments take it: every block shares one compiled
        (n_batches, B) geometry, tail blocks wrap-padded and masked.
        """
        assert self._blocked, "fused_scores is the long-segment path"
        times = self.window_times()
        b = self.cfg.batch_size
        n_raw = self._raw.shape[1]
        done = 0
        while done < self.n_windows:
            g0 = done * self.index_step
            r_b = min(g0, n_raw - self.block_raw)
            n_here = min(self.wins_per_block, self.n_windows - done)
            widxs = np.arange(done, done + n_here)
            # pad the tail block to BATCH granularity only (one extra scan-
            # length compile per distinct tail size): padding it to the full
            # block geometry kept a single compiled shape but scored up to
            # n_batches*b - n_here throwaway windows — ~25% of device time
            # on a 600 s segment (the round-3 strict-bench regression).
            n_batches = -(-n_here // b)
            pad = n_batches * b - n_here
            widxs_p = np.pad(widxs, (0, pad), mode="wrap")
            valid = np.pad(np.ones(n_here, bool), (0, pad))
            local = (widxs_p * self.index_step - r_b).astype(np.int32)
            starts = jnp.asarray(local.reshape(n_batches, b))
            block = jnp.asarray(self._raw[:, r_b : r_b + self.block_raw])
            scores = _fused_block_scores(
                block, starts, score_fn, self.cfg.slice_length, self.white,
                self.delta_t, self.cfg.segment_duration,
                self.cfg.max_filter_duration, self.cfg.low_frequency_cutoff,
            )
            yield scores, times[widxs_p], valid
            done += n_here

    def fused_scores_stream(
        self, score_spec_fn, plan_args: tuple, norm: str = "median",
        median_stride: int = 1,
    ) -> Iterator[Tuple[jnp.ndarray, np.ndarray, np.ndarray]]:
        """Streaming (window-overlap-reuse) variant of :meth:`fused_scores`.

        Per whitening block: whiten once, compute every Q row's energy
        series over the WHOLE block ONCE (gwkit.ops.qtransform
        .stream_energies — one rfft + band iDFTs as MXU matmuls, amortized
        over all ~2.5k windows of a 256 s block), then ``lax.scan`` over
        window batches where each batch only CROPS its spectrograms from the
        shared series (stream_crops) and runs the model forward. NOT exact
        per-window-transform parity (the block transform sees past window
        boundaries — see qtransform.py); opt-in, gated by
        scripts/validate_stream.py.

        ``plan_args`` are the GEOMETRY arguments of
        :func:`gwkit.ops.qtransform.make_stream_plan` — (duration,
        sample_rate, q_range, spectrogram_shape, mismatch) — hashable so the
        jitted block program caches across segments; the chunk duration is
        derived here as the power of two covering the whitened block (the
        block is zero-padded up to it). Tail batches edge-pad (repeat the
        last window).
        """
        assert self._blocked, "fused_scores_stream is the long-segment path"
        b = self.cfg.batch_size
        times = self.window_times()
        n_raw = self._raw.shape[1]
        wb_white = self.block_raw - 2 * self.half
        chunk_seconds = 1 << int(np.ceil(np.log2(wb_white * self.delta_t)))
        run = _stream_block_program(
            score_spec_fn, (*plan_args, chunk_seconds), self.white,
            self.delta_t, self.cfg.segment_duration,
            self.cfg.max_filter_duration, self.cfg.low_frequency_cutoff,
            norm, median_stride,
        )
        done = 0
        while done < self.n_windows:
            g0 = done * self.index_step
            r_b = min(g0, n_raw - self.block_raw)
            n_here = min(self.wins_per_block, self.n_windows - done)
            widxs = np.arange(done, done + n_here)
            n_batches = -(-n_here // b)
            pad = n_batches * b - n_here
            widxs_p = np.pad(widxs, (0, pad), mode="edge")
            valid = np.pad(np.ones(n_here, bool), (0, pad))
            local = (widxs_p * self.index_step - r_b).reshape(n_batches, b)
            block = jnp.asarray(self._raw[:, r_b : r_b + self.block_raw])
            scores = run(block, jnp.asarray(local.astype(np.int32)))
            yield scores, times[widxs_p], valid
            done += n_here

    def batches(self) -> Iterator[Tuple[jnp.ndarray, np.ndarray, np.ndarray]]:
        times = self.window_times()
        if not self._blocked:
            widxs = np.arange(self.n_windows)
            yield from self._batched(widxs, widxs * self.index_step, self.dss, times)
            return
        # blocked path: fixed-size raw blocks at window-aligned starts
        n_raw = self._raw.shape[1]
        done = 0  # windows emitted so far
        while done < self.n_windows:
            g0 = done * self.index_step  # whitened-global start of first window
            r_b = min(g0, n_raw - self.block_raw)  # tail block slides back
            block = jnp.asarray(self._raw[:, r_b : r_b + self.block_raw])
            dss = self._whiten(block)
            n_here = min(self.wins_per_block, self.n_windows - done)
            # local whitened offset of window (done + i) is g - r_b
            widxs = np.arange(done, done + n_here)
            local = widxs * self.index_step - r_b
            yield from self._batched(widxs, local, dss, times)
            done += n_here


from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _whiten_jit(strain, delta_t, segment_duration, max_filter_duration, low_frequency_cutoff):
    return whiten_estimate(
        strain,
        delta_t=delta_t,
        segment_duration=segment_duration,
        max_filter_duration=max_filter_duration,
        low_frequency_cutoff=low_frequency_cutoff,
    )


def _gather_windows_impl(dss: jnp.ndarray, starts: jnp.ndarray, slice_length: int) -> jnp.ndarray:
    offs = jnp.arange(slice_length)
    idx = starts[:, None] + offs[None, :]  # (B, L)
    return jnp.swapaxes(dss[:, idx], 0, 1)


@partial(jax.jit, static_argnums=(2,))
def _gather_windows(dss: jnp.ndarray, starts: jnp.ndarray, slice_length: int) -> jnp.ndarray:
    """(D, N), (B,) -> (B, D, slice_length) on-device window gather."""
    return _gather_windows_impl(dss, starts, slice_length)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fused_block_scores(
    raw, starts, score_fn, slice_length, white, delta_t,
    segment_duration, max_filter_duration, low_frequency_cutoff,
):
    """whiten(raw (D, N)) -> scan over starts (n_batches, B): gather windows
    and run ``score_fn`` — one dispatch per block. ``score_fn`` is a static
    argument: the executable caches per (function identity, geometry)."""
    dss = raw if white else whiten_estimate(
        raw, delta_t=delta_t, segment_duration=segment_duration,
        max_filter_duration=max_filter_duration,
        low_frequency_cutoff=low_frequency_cutoff,
    )

    def body(carry, st):
        w = _gather_windows_impl(dss, st, slice_length)
        return carry, score_fn(w).reshape(-1)

    _, scores = jax.lax.scan(body, 0, starts)
    return scores  # (n_batches, B)


import functools


@functools.lru_cache(maxsize=32)
def _stream_block_program(
    score_spec_fn, plan_args, white, delta_t, segment_duration,
    max_filter_duration, low_frequency_cutoff, norm, median_stride,
):
    """Compiled block program for the streaming search path: whiten(raw) ->
    ONE set of block-wide Q-row energy series (stream_energies) -> scan over
    window batches (crop spectrograms + one batch forward). The block pays
    the transforms once; every batch only gathers. lru-cached on the
    (function, geometry) key so every same-shaped block of every segment
    reuses one executable — a fresh jax.jit per segment would recompile the
    scan graph (the round-3 "warm" regression, docs/PERF.md lever 5)."""
    from gwkit.ops.qtransform import make_stream_plan, stream_crops, stream_energies

    splan = make_stream_plan(*plan_args)

    @jax.jit
    def run(raw, local_starts):
        dss = raw if white else whiten_estimate(
            raw, delta_t=delta_t, segment_duration=segment_duration,
            max_filter_duration=max_filter_duration,
            low_frequency_cutoff=low_frequency_cutoff,
        )
        pad = splan.chunk_samples - dss.shape[1]
        assert pad >= 0, "whitening block exceeds the stream chunk"
        energies = stream_energies(jnp.pad(dss, ((0, 0), (0, pad))), splan)

        def body(carry, ls):
            qspec = stream_crops(
                energies, ls.astype(jnp.float32) * delta_t, splan,
                norm=norm, median_stride=median_stride)
            return carry, score_spec_fn(qspec).reshape(-1)

        _, scores = jax.lax.scan(body, 0, local_starts)
        return scores  # (n_batches, B)

    return run
