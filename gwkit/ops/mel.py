"""Whisper log-mel front end as a fused, batched, device-resident op.

Reproduces ``transformers.WhisperFeatureExtractor`` semantics (the reference
runs it per-sample on CPU inside ``Dataset.__getitem__`` —
Signal_vs_Noise/src/dataset.py:20-24, Glitch_classification/src/dataset.py:46-47,
Efficiency_test/src/tools.py:56-57):

  pad audio with zeros to 30 s (480 000 samples @16 kHz)
  -> STFT (n_fft 400, hop 160, periodic Hann, centered reflect padding, power 2)
  -> drop the final frame -> 3000 frames
  -> slaney mel filter bank (80 mels, 0..8 kHz) with 1e-10 floor
  -> log10 -> clamp at (per-sample max - 8) -> (x + 4) / 4

TPU-first design: instead of materializing the 30 s zero-padded waveform and
3001 frames per sample, the fast path computes the STFT only over the frames
that can touch real audio; every later frame is *exactly* silence
(power 0 -> mel floor 1e-10 -> log10 = -10) so the tail is filled analytically.
This is bit-identical to the padded computation (verified in tests) and cuts
the front-end FLOPs/memory by ~30x for 1 s inputs.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from gwkit.ops.stft import stft_power

N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
SAMPLE_RATE = 16000
CHUNK_LENGTH = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000
_LOG_FLOOR = -10.0  # log10(1e-10)


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    mels = np.where(log_region, 15.0 + np.log(np.maximum(freq, 1e-30) / 1000.0) / (np.log(6.4) / 27.0), mels)
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    freq = 200.0 * mels / 3.0
    log_region = mels >= 15.0
    freq = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (mels - 15.0)), freq)
    return freq


@functools.lru_cache(maxsize=4)
def mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = N_MELS,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filters, (num_freq, num_mel).

    Numerically identical to ``transformers.audio_utils.mel_filter_bank`` with
    norm="slaney", mel_scale="slaney" (the Whisper configuration).
    """
    fft_freqs = np.linspace(0.0, sampling_rate // 2, num_frequency_bins)
    mel_min = _hz_to_mel_slaney(min_frequency)
    mel_max = _hz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hz_slaney(mel_freqs)

    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]  # (num_freq, num_mel+2)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney normalization: 2 / bandwidth
    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= enorm[None, :]
    return fb


def _log_mel_frames(audio_padded: jnp.ndarray, num_frames: int, dtype) -> jnp.ndarray:
    """(..., T_padded) -> (..., n_mels, num_frames) of log10 mel power."""
    power = stft_power(audio_padded, num_frames, N_FFT, HOP_LENGTH)  # (..., F, 201)
    filters = jnp.asarray(mel_filter_bank(), dtype=dtype)
    mel = jnp.einsum("...fk,km->...mf", power, filters)
    return jnp.log10(jnp.maximum(mel, 1e-10))


def whisper_log_mel(audio: jnp.ndarray, *, pad_to: int = N_SAMPLES, num_frames: int = N_FRAMES) -> jnp.ndarray:
    """Batched Whisper log-mel features: (B, N) audio -> (B, 80, 3000).

    ``audio`` is implicitly zero-padded to ``pad_to`` samples (WhisperFeatureExtractor
    "max_length" padding). N must be <= pad_to.
    """
    if audio.ndim == 1:
        audio = audio[None]
        squeeze = True
    else:
        squeeze = False
    B, N = audio.shape
    if N > pad_to:
        raise ValueError(f"audio length {N} exceeds pad_to {pad_to}")
    dtype = audio.dtype
    half = N_FFT // 2

    if N > pad_to - half:
        # Right edge interacts with the reflect padding: do the full computation.
        audio_full = jnp.pad(audio, ((0, 0), (0, pad_to - N)))
        padded = jnp.pad(audio_full, ((0, 0), (half, half)), mode="reflect")
        log_spec = _log_mel_frames(padded, num_frames, dtype)
    else:
        # Fast path: only frames overlapping [0, N) carry signal.
        n_real = min(num_frames, -(-(N + half) // HOP_LENGTH))
        right_pad = (n_real - 1) * HOP_LENGTH + N_FFT - half - N
        padded = jnp.pad(audio, ((0, 0), (0, max(0, right_pad))))
        padded = jnp.pad(padded, ((0, 0), (half, 0)), mode="reflect")
        real = _log_mel_frames(padded, n_real, dtype)  # (B, 80, n_real)
        fill = jnp.full((B, N_MELS, num_frames - n_real), _LOG_FLOOR, dtype=dtype)
        log_spec = jnp.concatenate([real, fill], axis=-1)

    # Per-sample dynamic-range clamp and affine scaling.
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec
