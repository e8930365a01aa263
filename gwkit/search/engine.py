"""Continuous-search engine: segments -> windows -> scores -> triggers -> events.

get_triggers parity (MLGWSC-1/inference.py:492-589) with the TPU pipeline:
per segment, strain is whitened on device, windows are gathered on device in
MXU-sized batches, and a single jit'd scoring program (Q-adapter -> encoder
per detector -> head, USR logits by default) produces signal scores. The
score used is output[:, 0] (inference.py:481); windows above the trigger
threshold become (time, score) triggers; clustering + the HDF5
time/stat/var/all_vals writer complete the reference surface
(inference.py:655-672).

Model loading consumes the reference-format component checkpoints written by
gwkit trainers: peft-compatible LoRA dir + head + Q-adapter states
(build_model, inference.py:415-430).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional, Tuple

import h5py
import jax
import numpy as np

from gwkit.search.cluster import get_clusters
from gwkit.search.slicer import DeviceSlicer, Segment, SlicerConfig, read_segments, stream_segments


# get_triggers used to build a fresh ``@jax.jit`` closure per call, which
# defeated jit caching ACROSS calls: the fused block path keys its executable
# cache on the score_fn's identity (it is a static argument), so every
# repeat search of the same file recompiled the whole scan graph — ~40 s on
# a remote-compile relay, measured as the round-3 real-file "warm" collapse
# (217x -> 101x). Keys are CONTENT fingerprints of the weight pytrees
# (VERDICT r3 #7): jax.Array leaves are immutable from Python, so identity
# suffices while the entry holds a strong reference (recycled ids are then
# impossible); mutable host leaves (numpy arrays) are digested by content so
# in-place mutation of a previously-scored pytree is a cache MISS, never a
# silent stale-weights hit.
_SCORE_FN_CACHE: "dict[tuple, tuple]" = {}


def _weights_fingerprint(tree) -> tuple:
    """Hashable fingerprint of a weight pytree: treedef + per-leaf identity
    (immutable jax arrays) or content digest (mutable numpy leaves)."""
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [hash(treedef)]
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            parts.append(("jax", id(leaf), leaf.shape, str(leaf.dtype)))
        elif isinstance(leaf, np.ndarray):
            h = hashlib.blake2b(np.ascontiguousarray(leaf).view(np.uint8), digest_size=16)
            parts.append(("np", h.hexdigest(), leaf.shape, str(leaf.dtype)))
        else:  # python scalars etc.
            parts.append(("py", type(leaf).__name__, leaf))
    return tuple(parts)


def _cached_score_fn(task, trainable, frozen, mode: str = "windows"):
    """``mode='windows'``: score (B, D, L) strain windows via task.forward.
    ``mode='qspec'``: score (B, D, F, T) precomputed Q spectrograms via
    task.forward_from_qspec — the streaming search front end."""
    key = (id(task), mode, _weights_fingerprint(trainable), _weights_fingerprint(frozen))
    hit = _SCORE_FN_CACHE.get(key)
    if hit is not None:
        # LRU, not FIFO: move-to-end so a resident server alternating one
        # hot weight set against many transients never evicts the hot entry
        # (dict preserves insertion order; eviction pops the oldest key)
        _SCORE_FN_CACHE[key] = _SCORE_FN_CACHE.pop(key)
        return hit[3]

    # Snapshot mutable leaves so a later in-place mutation cannot alter what
    # this entry's closure computes with (the key already guarantees a miss;
    # the copy guarantees the OLD entry stays self-consistent too).
    trainable = jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, np.ndarray) else x, trainable
    )
    frozen = jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, np.ndarray) else x, frozen
    )
    fwd = task.forward if mode == "windows" else task.forward_from_qspec

    @jax.jit
    def score_fn(inputs):
        out = fwd(trainable, frozen, inputs)
        return out[:, 0]

    if len(_SCORE_FN_CACHE) >= 8:  # bound stale weight retention
        _SCORE_FN_CACHE.pop(next(iter(_SCORE_FN_CACHE)))
    _SCORE_FN_CACHE[key] = (task, trainable, frozen, score_fn)
    return score_fn


@dataclasses.dataclass
class SearchResult:
    triggers: Dict[str, List[List[float]]]
    all_vals: np.ndarray
    n_windows: int
    strain_seconds: float
    wall_seconds: float

    @property
    def throughput_x_realtime(self) -> float:
        return self.strain_seconds / max(self.wall_seconds, 1e-9)


def score_segments(
    score_fn,
    segments: List[Segment],
    slicer_cfg: SlicerConfig = SlicerConfig(),
    trigger_threshold: float = -0.5,
    white: bool = False,
    whitened_out: Optional[str] = None,
    detectors: Optional[List[str]] = None,
    verbose: bool = False,
    mesh=None,
    fuse_blocks: bool = True,
    stream_score_fn=None,
    stream_plan_args: Optional[tuple] = None,
    stream_norm: str = "median",
    stream_median_stride: int = 1,
) -> SearchResult:
    """Run ``score_fn(windows (B,D,L)) -> scores (B,)`` over every segment.

    Returns per-segment trigger lists ([time, score] with score > threshold)
    plus the concatenated raw score stream (all_vals debug surface).

    ``fuse_blocks``: long (blocked) segments run whiten + window gather +
    ALL per-batch forwards of each 256 s block as ONE jit dispatch
    (DeviceSlicer.fused_scores) — on tunneled TPUs the per-dispatch RPC
    round trip dominates the month-scale search (docs/PERF.md lever 5).
    Disabled automatically when a mesh resharding hook is requested (the
    unfused path places each batch explicitly).

    ``stream_score_fn`` + ``stream_plan_args``: opt-in streaming Q-scan
    front end (window-overlap reuse, PERF lever 4) — long (blocked) segments
    Q-transform each chunk of strain ONCE and windows crop their
    spectrograms from the shared per-row energy series
    (DeviceSlicer.fused_scores_stream); ``stream_score_fn`` consumes
    (B, D, F, T) spectrograms. Short (unblocked) segments fall back to the
    exact per-window path. NOT exact per-window-transform parity — gated by
    scripts/validate_stream.py (docs/results/stream_parity.md).

    ``mesh``: optional jax Mesh — window batches are resharded over its
    "data" axis before scoring, so one host's whitened segment fans out over
    all its chips (SURVEY.md §2.9: shard-by-segment across hosts +
    shard-by-window across chips; trigger lists gather host-side).
    Batch size must divide by the mesh's data-axis size.
    """
    batch_sharding = None
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gwkit.parallel.mesh import DATA_AXIS

        batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None, None))
    triggers: Dict[str, List[List[float]]] = {}
    all_vals: List[np.ndarray] = []
    n_windows = 0
    strain_seconds = 0.0
    t0 = time.time()
    for seg in segments:
        slicer = DeviceSlicer(seg, slicer_cfg, white=white)
        if whitened_out is not None:
            if slicer.dss is None:  # blocked long-segment path whitens lazily
                logging.warning(
                    "segment %s exceeds the whitening block size; skipping "
                    "--debug-whitened-file output for it", seg.key,
                )
            else:
                with h5py.File(whitened_out, "a") as wf:
                    dets = detectors or [f"det{i}" for i in range(seg.strain.shape[0])]
                    for i, det in enumerate(dets):
                        wf.require_group(det).create_dataset(seg.key, data=np.asarray(slicer.dss[i]))
        # dispatch every batch asynchronously; block once per segment so the
        # device pipeline stays full (per-batch np.asarray would sync-stall)
        pending = []
        if (stream_score_fn is not None and batch_sharding is None
                and getattr(slicer, "_blocked", False)):
            for dev_scores, times, valid in slicer.fused_scores_stream(
                    stream_score_fn, stream_plan_args, norm=stream_norm,
                    median_stride=stream_median_stride):
                pending.append((dev_scores, times, valid))
        elif fuse_blocks and batch_sharding is None and getattr(slicer, "_blocked", False):
            for dev_scores, times, valid in slicer.fused_scores(score_fn):
                pending.append((dev_scores, times, valid))
        else:
            for windows, times, valid in slicer.batches():
                if batch_sharding is not None:
                    import jax

                    windows = jax.device_put(windows, batch_sharding)
                pending.append((score_fn(windows), times, valid))
        seg_triggers: List[List[float]] = []
        for dev_scores, times, valid in pending:
            scores = np.asarray(dev_scores).reshape(-1)[: len(valid)]
            all_vals.append(scores[valid].astype(np.float32))
            keep = (scores > trigger_threshold) & valid
            for ts, sc in zip(times[keep], scores[keep]):
                seg_triggers.append([float(ts), float(sc)])
        triggers[slicer.key] = seg_triggers
        n_windows += len(slicer)
        strain_seconds += seg.strain.shape[1] * seg.delta_t
        if verbose:
            logging.info("segment %s: %d windows, %d triggers", seg.key, len(slicer), len(seg_triggers))
    wall = time.time() - t0
    return SearchResult(
        triggers=dict(sorted(triggers.items())),
        all_vals=np.concatenate(all_vals) if all_vals else np.zeros(0, np.float32),
        n_windows=n_windows,
        strain_seconds=strain_seconds,
        wall_seconds=wall,
    )


def get_triggers(
    task,
    inputfile: str,
    trainable=None,
    step_size: float = 0.1,
    trigger_threshold: float = -0.5,
    white: bool = False,
    whitened_file: Optional[str] = None,
    low_frequency_cutoff: float = 20.0,
    # 128 is reproducibly the fastest scoring batch at both geometries on
    # TPU v5e (real-file sweep 64/128/256/512/1024: the curve peaks at 128,
    # larger batches lose to VMEM/HBM pressure — docs/PERF.md round 3). The
    # reference's DataLoader batch 256 (inference.py:465) is a free
    # parameter, not search semantics.
    batch_size: int = 128,
    verbose: bool = False,
    stream: Optional[bool] = None,
    shard_dir: Optional[str] = None,
    qscan_stream: bool = False,
) -> Tuple[Dict[str, List[List[float]]], np.ndarray, SearchResult]:
    """Full reference get_triggers flow on a gwkit Task (usually mlgwsc, USR).

    ``stream``: None (default) auto-selects — segments stream with the C++
    whole-array prefetcher (gwkit.native.hostio.ArrayPrefetch: segment i+1
    is read by a C++ thread, zero GIL contention, while the device scores
    segment i) whenever the file's datasets are contiguous uncompressed
    f64/f32; otherwise everything is read eagerly up front. ``stream=True``
    forces streaming (falling back to a Python h5py reader thread for
    non-native files — measured slower on single-core hosts), ``False``
    forces eager reads. Outputs are identical in all modes.

    Multi-host: under ``jax.distributed`` (process_count > 1) each host
    scores a round-robin share of the segments and the per-segment trigger
    lists are gathered through ``shard_dir`` (a shared filesystem path);
    ``all_vals`` stays host-local (debug surface only).

    The jitted scoring closure is cached per (task, weights-fingerprint),
    so repeat calls reuse compiled executables (a fresh closure per call
    forced a full recompile of the fused scan graph — the round-3 "warm"
    real-file regression). The fingerprint digests mutable (numpy) leaves by
    content, so mutating a previously-scored pytree in place is a cache
    miss — new weights always score with a fresh closure.
    """
    trainable = trainable if trainable is not None else task.trainable
    frozen = task.frozen
    score_fn = _cached_score_fn(task, trainable, frozen)

    # Streaming Q-scan front end (opt-in, PERF lever 4): block-wide row
    # transforms amortize the band iDFTs across the 95% window overlap (the
    # slicer derives the chunk duration from its whitening-block size).
    stream_kwargs: dict = {}
    if qscan_stream:
        if task.forward_from_qspec is None or task.qcfg is None:
            raise ValueError("qscan_stream requires a task with a Q-scan "
                             "front end (forward_from_qspec + qcfg)")
        qcfg = task.qcfg
        stream_kwargs = dict(
            stream_score_fn=_cached_score_fn(task, trainable, frozen, mode="qspec"),
            stream_plan_args=(
                qcfg.kernel_length, float(qcfg.sample_rate), qcfg.q_range,
                qcfg.spectrogram_shape, 0.2,
            ),
            stream_norm=qcfg.qscan_norm,
            stream_median_stride=qcfg.median_stride,
        )

    if stream is None:
        from gwkit.search.slicer import native_streamable

        stream = native_streamable(inputfile)
    # Multi-host sharding happens at the KEY level, before any dataset read:
    # each host round-robins the longest-first key order so it only opens
    # (and prefetches) its own share — filtering the yielded stream instead
    # would make every host materialize the whole file (ADVICE r2).
    n_proc = jax.process_count()
    key_filter = None
    if n_proc > 1:
        from gwkit.parallel.distributed import host_key_filter

        key_filter = host_key_filter(jax.process_index(), n_proc)
    segments = (
        stream_segments(inputfile, key_filter=key_filter)
        if stream
        else read_segments(inputfile, key_filter=key_filter)
    )
    cfg = SlicerConfig(
        step_size=step_size, low_frequency_cutoff=low_frequency_cutoff, batch_size=batch_size
    )
    result = score_segments(
        score_fn, segments, cfg, trigger_threshold=trigger_threshold,
        white=white, whitened_out=whitened_file, verbose=verbose,
        **stream_kwargs,
    )
    if n_proc > 1:
        from gwkit.parallel.distributed import gather_trigger_lists

        result = dataclasses.replace(
            result, triggers=gather_trigger_lists(result.triggers, shard_dir)
        )
    return result.triggers, result.all_vals, result


def write_search_output(
    path: str,
    triggers: Dict[str, List[List[float]]],
    all_vals: np.ndarray,
    cluster_threshold: float = 0.35,
    raw_triggers_path: Optional[str] = None,
) -> None:
    """Cluster and write the reference HDF5 output (inference.py:655-672)."""
    if raw_triggers_path is not None:
        with h5py.File(raw_triggers_path, "w") as dbg:
            for key, trig_list in triggers.items():
                dbg.create_dataset(key, data=np.asarray(trig_list, dtype=np.float32))
    times, stats, tvars = get_clusters(triggers, cluster_threshold)
    with h5py.File(path, "w") as out:
        out.create_dataset("time", data=times)
        out.create_dataset("stat", data=stats)
        out.create_dataset("var", data=tvars)
        out.create_dataset("all_vals", data=np.asarray(all_vals, np.float32))
