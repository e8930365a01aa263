"""FFT resampling with ``scipy.signal.resample`` parity, batched on device.

The reference resamples 2048 Hz strain to 16 kHz so Whisper's speech front end
accepts it (Signal_vs_Noise/utils/preprocess.py:44-51 and four duplicates —
SURVEY.md §2.1 "Resampler"). Here it is one batched jittable op.
"""
from __future__ import annotations

import jax.numpy as jnp


def resample_fourier(x: jnp.ndarray, num: int) -> jnp.ndarray:
    """Resample the last axis of a real signal to ``num`` samples via the FFT.

    Matches scipy.signal.resample for real input (including the even-length
    Nyquist-bin conventions: halve it when upsampling, double the new Nyquist
    when downsampling to an even length).
    """
    n = x.shape[-1]
    if num == n:
        return x
    spec = jnp.fft.rfft(x, axis=-1)
    nyq = min(n, num) // 2 + 1
    out_bins = num // 2 + 1
    if num > n:  # upsample: zero-pad the spectrum
        y = jnp.zeros(x.shape[:-1] + (out_bins,), dtype=spec.dtype)
        y = y.at[..., :nyq].set(spec[..., :nyq])
        if n % 2 == 0:
            y = y.at[..., n // 2].multiply(0.5)
    else:  # downsample: truncate the spectrum
        y = spec[..., :out_bins]
        if num % 2 == 0:
            # scipy folds the (dropped) mirrored negative bin into the new Nyquist
            y = y.at[..., num // 2].multiply(2.0)
    out = jnp.fft.irfft(y, num, axis=-1)
    return (out * (num / n)).astype(x.dtype)


def resample_timeseries(
    data: jnp.ndarray, original_sampling_rate: int = 2048, target_sampling_rate: int = 16000
) -> jnp.ndarray:
    """Reference-parity helper (Signal_vs_Noise/utils/preprocess.py:44-51)."""
    target_length = data.shape[-1] * target_sampling_rate // original_sampling_rate
    return resample_fourier(data, target_length)
