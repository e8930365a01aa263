"""Stream evaluation, bulk scorer, and real-events surface tests."""
import h5py
import numpy as np
import pytest

import jax

from gwkit.evaluation.stream import evaluate_score_stream, scores_to_series
from gwkit.search.bulk import USR_MATRIX, score_files, usr_scores


def test_scores_to_series_usr_and_softmax():
    scores = np.array([[0.9, 0.1], [0.3, 0.7]])
    times = np.array([0.0, 0.1])
    usr, t = scores_to_series(scores, times, mode="usr")
    np.testing.assert_allclose(usr, [0.8, -0.4])
    soft, _ = scores_to_series(scores, times, mode="softmax")
    np.testing.assert_allclose(soft, [0.9, 0.3])


def test_usr_matrix_swap():
    probs = np.array([[0.8, 0.2]])
    out = usr_scores(probs)
    np.testing.assert_allclose(out, [[0.6, -0.6]])
    assert USR_MATRIX.shape == (2, 2)


def test_evaluate_score_stream_known_scenario():
    t = np.arange(0, 100, 0.1)
    v = np.zeros_like(t)
    # injection at t=50: strong peak; false alarm at t=80: weaker peak
    v[(t > 49.9) & (t < 50.3)] = 0.9
    v[(t > 79.9) & (t < 80.1)] = 0.6
    inj = {"tc": np.array([50.0]), "mass1": np.array([30.0]),
           "mass2": np.array([30.0]), "distance": np.array([100.0])}
    res = evaluate_score_stream(v, t, inj, trigger_thresh=0.2,
                                ranking_thresholds=[0.5, 0.7])
    # at 0.5: both events -> 1 TP, 1 FP; at 0.7: only the injection
    assert res.sensitive_fraction[0] == 1.0
    assert res.far_per_month[0] > 0
    assert res.sensitive_fraction[1] == 1.0
    assert res.far_per_month[1] == 0.0
    assert np.isfinite(res.sensitive_distance).all()


def test_bulk_scorer_resume(tmp_path, rng):
    from gwkit.models.whisper import WhisperConfig
    from gwkit.train.tasks import build_signal_vs_noise

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=1500)
    task = build_signal_vs_noise(jax.random.PRNGKey(0), encoder=enc,
                                 input_sample_rate=256, n_frames=128, num_classes=2)

    files = []
    for i in range(2):
        path = str(tmp_path / f"f{i}.hdf")
        with h5py.File(path, "w") as f:
            f.create_dataset("data/0", data=rng.normal(size=(5, 2, 256)).astype(np.float32))
        files.append(path)

    out = str(tmp_path / "scores.hdf")
    log = str(tmp_path / "scores.log")
    score_files(task, files, out, log_path=log, chunk=4)
    with h5py.File(out) as f:
        assert set(f.keys()) == {"f0.hdf", "f1.hdf"}
        assert f["f0.hdf"].shape == (5, 2)
    # resume: delete output entry, keep log -> file skipped, not re-added
    with h5py.File(out, "a") as f:
        del f["f0.hdf"]
    score_files(task, files, out, log_path=log, chunk=4)
    with h5py.File(out) as f:
        assert "f0.hdf" not in f  # skipped thanks to the log


def test_real_events_scoring(rng):
    from gwkit.models.whisper import WhisperConfig
    from gwkit.search.realevents import score_event_segments, write_event_scores
    from gwkit.train.tasks import build_signal_vs_noise

    enc = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=1500)
    task = build_signal_vs_noise(jax.random.PRNGKey(0), encoder=enc,
                                 input_sample_rate=256, n_frames=128)
    events = {"GW150914": rng.normal(size=(2, 1024)).astype(np.float32)}
    scores = score_event_segments(task, events, sample_rate=256.0, window=256,
                                  step=64, batch_size=8)
    n_expected = 1 + (1024 - 256) // 64
    assert scores["GW150914"].shape == (n_expected,)
    assert ((scores["GW150914"] >= 0) & (scores["GW150914"] <= 1)).all()
