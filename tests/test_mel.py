"""Golden tests: gwkit log-mel front end vs transformers.WhisperFeatureExtractor.

Reference behavior: Signal_vs_Noise/src/dataset.py:20-24 runs the extractor
per-sample; here it is a batched device op. Tolerances are fp32-level.
"""
import numpy as np
import pytest

from gwkit.ops.mel import mel_filter_bank, whisper_log_mel

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()  # defaults = whisper-tiny config


def test_mel_filter_bank_matches_hf(hf_extractor):
    ours = mel_filter_bank()
    theirs = hf_extractor.mel_filters
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


@pytest.mark.parametrize("n_samples", [16000, 16384, 4096])
def test_log_mel_matches_hf(hf_extractor, rng, n_samples):
    audio = rng.normal(size=(3, n_samples)).astype(np.float32)
    ref = hf_extractor(
        [a for a in audio], sampling_rate=16000, return_tensors="np"
    ).input_features
    ours = np.asarray(whisper_log_mel(audio))
    assert ours.shape == (3, 80, 3000)
    # HF computes the STFT in float64; our device kernel runs in float32. At
    # near-zero spectral bins (leakage floor) the f32 FFT's absolute error
    # (~eps*||x||) becomes a ~5e-4 relative error, i.e. ~2e-4 in log10 space.
    # 2e-3 is far below the bf16 resolution the encoder consumes.
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_fast_path_matches_full_path(rng):
    audio = rng.normal(size=(2, 16000)).astype(np.float32)
    fast = np.asarray(whisper_log_mel(audio))
    # Force the full path by pre-padding to the chunk length.
    full_audio = np.zeros((2, 480000), dtype=np.float32)
    full_audio[:, :16000] = audio
    full = np.asarray(whisper_log_mel(full_audio))
    np.testing.assert_allclose(fast, full, rtol=0, atol=1e-5)


def test_single_sample_shape(rng):
    audio = rng.normal(size=16000).astype(np.float32)
    out = whisper_log_mel(audio)
    assert out.shape == (80, 3000)


@pytest.mark.parametrize("n_samples", [480000, 479900, 479700])
def test_log_mel_near_chunk_boundary(hf_extractor, rng, n_samples):
    """Lengths at/near pad_to exercise the full (reflect-padded) path."""
    audio = rng.normal(size=(1, n_samples)).astype(np.float32)
    ref = hf_extractor([audio[0]], sampling_rate=16000, return_tensors="np").input_features
    ours = np.asarray(whisper_log_mel(audio))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-3)


def test_log_mel_custom_short_context(rng):
    """The n_frames/pad_to knob used by short-context tasks."""
    audio = rng.normal(size=(2, 16000)).astype(np.float32)
    out = np.asarray(whisper_log_mel(audio, pad_to=256 * 160, num_frames=256))
    assert out.shape == (2, 80, 256)
    full = np.asarray(whisper_log_mel(audio))
    # real frames must agree up to the per-sample max renormalization
    # (the max over 256 frames == max over 3000 since padding is silence)
    np.testing.assert_allclose(out[:, :, :100], full[:, :, :100], rtol=1e-5, atol=1e-5)
