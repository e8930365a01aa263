"""Search + evaluation tests: clustering semantics, slicer geometry,
get_stats on a constructed scenario with known answers."""
import h5py
import numpy as np
import pytest

import jax.numpy as jnp

from gwkit.evaluation.mlgwsc import find_closest_index, find_injection_times, get_stats, mchirp
from gwkit.search.cluster import (
    false_alarm_rate,
    get_cluster_boundaries,
    get_clusters,
    get_event_list_from_triggers,
    get_triggers_from_series,
    sensitive_fraction,
    split_true_and_false_positives,
)
from gwkit.search.slicer import DeviceSlicer, Segment, SlicerConfig


def test_get_clusters_reference_semantics():
    # gap > 0.35 starts a new cluster; max-stat representative; var 0.2
    triggers = {
        "seg1": [[1.0, 0.5], [1.1, 0.9], [1.2, 0.7], [2.0, 0.3]],
        "seg2": [[5.0, 1.0]],
    }
    times, stats, tvars = get_clusters(triggers, cluster_threshold=0.35)
    np.testing.assert_allclose(times, [1.1, 2.0, 5.0])
    np.testing.assert_allclose(stats, [0.9, 0.3, 1.0])
    np.testing.assert_allclose(tvars, [0.2, 0.2, 0.2])


def test_get_clusters_empty():
    times, stats, tvars = get_clusters({"a": []})
    assert len(times) == 0


def test_bnslib_cluster_chain():
    t = np.arange(100) * 0.1
    v = np.zeros(100)
    v[10:13] = [0.5, 0.9, 0.6]  # event at t=1.1
    v[50] = 0.8  # event at t=5.0
    trig = get_triggers_from_series(v, t, 0.2)
    assert trig.shape[1] == 4
    clusters = get_cluster_boundaries(trig, boundary_time=1.0)
    assert len(clusters) == 2
    events = get_event_list_from_triggers(trig, clusters)
    assert events[0] == (pytest.approx(1.1), pytest.approx(0.9))
    assert events[1] == (pytest.approx(5.0), pytest.approx(0.8))

    tp, fp = split_true_and_false_positives(events, np.array([1.0]), tolerance=0.5)
    assert len(tp) == 1 and len(fp) == 1
    far = false_alarm_rate(v, t, np.array([1.0]), trigger_thresh=0.2, ranking_thresh=0.5)
    assert far > 0
    sf = sensitive_fraction(v, t, np.array([1.0]), trigger_thresh=0.2, ranking_thresh=0.5)
    assert sf == 1.0


def test_device_slicer_geometry(rng):
    fs = 2048
    strain = rng.normal(size=(2, fs * 8)).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=100.0, delta_t=1.0 / fs)
    sl = DeviceSlicer(seg, SlicerConfig(batch_size=32), white=True)
    # white=True: no crop; windows = 1 + (N - 2048)//204
    assert len(sl) == 1 + (fs * 8 - 2048) // 204
    times = sl.window_times()
    assert times[0] == pytest.approx(100.0 + 0.6)
    assert times[1] - times[0] == pytest.approx(204 / fs)
    batches = list(sl.batches())
    total = sum(v.sum() for _, _, v in batches)
    assert total == len(sl)
    w, t0, v0 = batches[0]
    assert w.shape == (32, 2, 2048)
    np.testing.assert_allclose(np.asarray(w[0]), strain[:, :2048], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w[1]), strain[:, 204 : 204 + 2048], rtol=1e-6)


def test_device_slicer_blocked_matches_unblocked_white(rng):
    """Blocked windowing (long-segment path) must produce exactly the same
    windows/times as the unsplit path when no whitening is involved."""
    fs = 256
    strain = rng.normal(size=(2, fs * 64)).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=10.0, delta_t=1.0 / fs)
    cfg = SlicerConfig(step_size=0.25, slice_length=512, batch_size=16)
    ref = DeviceSlicer(seg, cfg, white=True, max_block=1 << 30)
    blk = DeviceSlicer(seg, cfg, white=True, max_block=2048)
    assert blk._blocked and not ref._blocked
    assert len(blk) == len(ref)
    ref_out = [(np.asarray(w)[v], t[v]) for w, t, v in ref.batches()]
    blk_out = [(np.asarray(w)[v], t[v]) for w, t, v in blk.batches()]
    rw = np.concatenate([w for w, _ in ref_out])
    bw = np.concatenate([w for w, _ in blk_out])
    rt = np.concatenate([t for _, t in ref_out])
    bt = np.concatenate([t for _, t in blk_out])
    np.testing.assert_array_equal(bw, rw)
    np.testing.assert_array_equal(bt, rt)


def test_device_slicer_blocked_whitened_runs(rng):
    fs = 256
    strain = (rng.normal(size=(2, fs * 120)) * 1e-21).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=0.0, delta_t=1.0 / fs)
    cfg = SlicerConfig(step_size=0.5, slice_length=256, batch_size=32,
                       segment_duration=2.0, max_filter_duration=1.0,
                       low_frequency_cutoff=10.0)
    sl = DeviceSlicer(seg, cfg, white=False, max_block=fs * 32)
    assert sl._blocked
    total = 0
    for w, t, v in sl.batches():
        assert np.isfinite(np.asarray(w)).all()
        total += v.sum()
    assert total == len(sl)


def test_device_slicer_whitening_crop(rng):
    fs = 2048
    strain = (rng.normal(size=(2, fs * 8)) * 1e-21).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=0.0, delta_t=1.0 / fs)
    sl = DeviceSlicer(seg, SlicerConfig(batch_size=64), white=False)
    assert sl.start_time == pytest.approx(0.125)
    assert np.asarray(sl.dss).shape[1] == fs * 8 - 512
    assert np.isfinite(np.asarray(sl.dss)).all()


def test_get_event_list_series_and_closest_injections():
    from gwkit.search.cluster import get_closest_injection_times, get_event_list

    t = np.arange(0, 10, 0.1)
    v = np.zeros_like(t)
    v[12] = 0.9
    v[50] = 0.7
    events = get_event_list(v, t, [[1.0, 1.5], [4.8, 5.2]])
    assert events[0] == (pytest.approx(1.2), pytest.approx(0.9))
    assert events[1] == (pytest.approx(5.0), pytest.approx(0.7))

    inj = np.array([10.0, 20.0, 30.0])
    times, idxs = get_closest_injection_times(inj, [11.0, 29.0], return_indices=True)
    np.testing.assert_array_equal(times, [10.0, 30.0])
    np.testing.assert_array_equal(idxs, [0, 2])


def test_distributed_single_process_helpers():
    from gwkit.parallel.distributed import gather_trigger_lists, initialize, shard_segments_across_hosts

    initialize()  # no-op single process
    segs = list(range(7))
    assert shard_segments_across_hosts(segs, 0, 2) == [0, 2, 4, 6]
    assert shard_segments_across_hosts(segs, 1, 2) == [1, 3, 5]
    trig = {"a": [[1.0, 2.0]]}
    assert gather_trigger_lists(trig) == trig


def test_find_closest_index():
    arr = np.array([0.0, 1.0, 5.0, 10.0])
    vals = np.array([-1.0, 0.4, 0.6, 7.4, 7.6, 20.0])
    idx = find_closest_index(arr, vals)
    np.testing.assert_array_equal(idx, [0, 0, 1, 2, 3, 3])


def test_get_stats_known_answers():
    # 3 injections; events: 2 true positives (one shared injection), 2 false
    injtc = np.array([100.0, 200.0, 300.0])
    injdist = np.array([50.0, 100.0, 150.0])
    fg = np.array([
        [100.05, 100.1, 150.0, 200.02, 250.0],  # times
        [5.0, 7.0, 1.0, 6.0, 2.0],              # stats
        [0.2, 0.2, 0.2, 0.2, 0.2],              # var
    ])
    bg = np.array([[10.0, 20.0, 30.0], [0.5, 1.5, 2.5], [0.2, 0.2, 0.2]])
    stats = get_stats(fg, bg, {"tc": injtc, "distance": injdist}, duration=1000.0)
    # TP: events at 100.05, 100.1 (inj 0) and 200.02 (inj 1); FP: 150.0, 250.0
    np.testing.assert_array_equal(stats["true-positive-event-indices"], [0, 1, 3])
    np.testing.assert_array_equal(stats["false-positive-event-indices"], [2, 4])
    # far: 3 bg events over 1000 s -> [3,2,1]... minus 1 convention
    np.testing.assert_allclose(stats["far"], np.array([2, 1, 0]) / 1000.0)
    # found injections: inj0 (best stat 7), inj1 (6); missed: inj2
    # sensitive fraction at the lowest bg threshold: 2/3
    assert stats["sensitive-fraction"][0] == pytest.approx(2.0 / 3.0)
    # sensitive distance <= max distance
    assert np.all(stats["sensitive-distance"] <= 150.0 + 1e-9)


def test_find_injection_times(tmp_path):
    fg_path = str(tmp_path / "fg.hdf")
    inj_path = str(tmp_path / "inj.hdf")
    with h5py.File(fg_path, "w") as f:
        g = f.create_group("H1")
        d = g.create_dataset("0", data=np.zeros(2048 * 100, np.float32))
        d.attrs["start_time"] = 1000.0
        d.attrs["delta_t"] = 1.0 / 2048
    with h5py.File(inj_path, "w") as f:
        f.create_dataset("tc", data=np.array([990.0, 1035.0, 1095.0, 1200.0]))
    dur, mask = find_injection_times([fg_path], inj_path, padding_start=30, padding_end=30)
    assert dur == pytest.approx(100.0)
    np.testing.assert_array_equal(mask, [False, True, False, False])


def test_volume_montecarlo_uniform_volume():
    from gwkit.evaluation.sensitivity import volume_montecarlo

    # uniform-in-volume injections: V = Vtot * nfound/n
    found = np.array([10.0, 20.0, 30.0])
    missed = np.array([40.0, 50.0, 60.0])
    ones = np.ones(3)
    vol, err = volume_montecarlo(found, missed, ones, ones, "distance", "volume", "distance")
    vtot = 4.0 / 3.0 * np.pi * 60.0 ** 3
    assert vol == pytest.approx(vtot * 0.5)
    assert err > 0


def test_stream_segments_matches_read_segments(tmp_path):
    import h5py

    from gwkit.search.slicer import read_segments, stream_segments

    path = str(tmp_path / "segs.hdf")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for det in ("H1", "L1"):
            g = f.create_group(det)
            for key, n in (("0", 4096), ("1", 8192)):
                ds = g.create_dataset(key, data=rng.normal(size=n))
                ds.attrs["start_time"] = 100.0 + float(key)
                ds.attrs["delta_t"] = 1.0 / 2048.0
    eager = read_segments(path)
    lazy = list(stream_segments(path))
    assert [s.key for s in lazy] == [s.key for s in eager]  # longest-first
    for a, b in zip(eager, lazy):
        assert a.start_time == b.start_time and a.delta_t == b.delta_t
        np.testing.assert_array_equal(a.strain, b.strain)


def test_fused_block_scores_match_batches(rng):
    """DeviceSlicer.fused_scores (one dispatch per whitening block: whiten +
    gather + lax.scan over batch forwards) must produce the same scores and
    times as the per-batch path, including the wrap-padded tail block."""
    import jax
    import jax.numpy as jnp

    from gwkit.search.slicer import DeviceSlicer, Segment, SlicerConfig

    strain = rng.normal(size=(2, 4096)).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=3.0, delta_t=1.0 / 256)
    cfg = SlicerConfig(step_size=0.25, slice_length=256, batch_size=8,
                       segment_duration=2.0, max_filter_duration=0.5,
                       low_frequency_cutoff=10.0)
    score_fn = jax.jit(lambda w: jnp.sum(w.astype(jnp.float32) ** 2, axis=(1, 2)))

    def collect(pairs):
        scores, times = [], []
        for s, t, v in pairs:
            flat = np.asarray(s).reshape(-1)[: len(v)]
            scores.append(flat[v])
            times.append(np.asarray(t)[: len(v)][v])
        return np.concatenate(scores), np.concatenate(times)

    sl_f = DeviceSlicer(seg, cfg, max_block=1024)
    assert sl_f._blocked, "test needs the blocked long-segment path"
    got_s, got_t = collect(
        (s, t, v) for s, t, v in sl_f.fused_scores(score_fn))

    sl_b = DeviceSlicer(seg, cfg, max_block=1024)
    want_s, want_t = collect(
        (score_fn(w), t, v) for w, t, v in sl_b.batches())

    np.testing.assert_allclose(got_t, want_t, rtol=0, atol=0)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)


class _CacheProbeTask:
    trainable = {"w": jnp.ones((2,))}
    frozen = {}

    @staticmethod
    def forward(tr, fr, windows):
        s = jnp.sum(windows, axis=(1, 2)) * tr["w"][0]
        return jnp.stack([s, -s], axis=1)


def test_score_fn_cache_reuses_jitted_closure():
    """Repeat get_triggers calls with the same (task, weights) must reuse
    ONE jitted score_fn (cache keyed on a weights fingerprint with strong
    refs) — a fresh closure per call recompiles the fused scan graph every
    search (the round-3 real-file 'warm' regression). New weight objects
    get a fresh entry."""
    from gwkit.search import engine

    task = _CacheProbeTask()
    engine._SCORE_FN_CACHE.clear()
    f1 = engine._cached_score_fn(task, task.trainable, task.frozen)
    f2 = engine._cached_score_fn(task, task.trainable, task.frozen)
    assert f1 is f2
    other = {"w": jnp.full((2,), 2.0)}
    f3 = engine._cached_score_fn(task, other, task.frozen)
    assert f3 is not f1
    w = jnp.ones((3, 2, 4))
    np.testing.assert_allclose(np.asarray(f1(w)), np.full(3, 8.0))
    np.testing.assert_allclose(np.asarray(f3(w)), np.full(3, 16.0))


def test_score_fn_cache_misses_on_inplace_mutation():
    """Mutating a previously-scored pytree's numpy leaves IN PLACE must be a
    cache miss (VERDICT r3 #7): the fingerprint digests mutable leaf content,
    so stale compiled weights can never silently score new values."""
    from gwkit.search import engine

    task = _CacheProbeTask()
    weights = {"w": np.ones(2, np.float32)}  # host-mutable leaves
    engine._SCORE_FN_CACHE.clear()
    f1 = engine._cached_score_fn(task, weights, task.frozen)
    w = jnp.ones((3, 2, 4))
    np.testing.assert_allclose(np.asarray(f1(w)), np.full(3, 8.0))

    weights["w"][0] = 2.0  # in-place mutation, same object identity
    f2 = engine._cached_score_fn(task, weights, task.frozen)
    assert f2 is not f1  # miss, not a stale hit
    np.testing.assert_allclose(np.asarray(f2(w)), np.full(3, 16.0))
    # and the OLD entry still computes with its original (snapshotted) values
    np.testing.assert_allclose(np.asarray(f1(w)), np.full(3, 8.0))
