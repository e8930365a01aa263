"""Frequency-domain whitening with PyCBC inverse-spectrum-truncation semantics.

The reference has three whitening implementations (SURVEY.md §2.1):
  1. MLGWSC-1 inference whitening — Welch-median PSD estimate per segment,
     inverse spectrum truncation (hann), edge crop of max_filter_len//2 each
     side (MLGWSC-1/inference.py:56-137; start-time compensation +0.125 s at
     :244-246). -> :func:`whiten_estimate`
  2. bnslib known-PSD whitening — analytic/named PSD, zero below f_low,
     crop max_filter_len each side (bnslib.py:62-133). -> :func:`whiten_psd`
  3. pycbc TimeSeries.whiten in the glitch builder (4 s segments)
     — same machinery as (1) with different durations.

All are batched jittable device functions. PyCBC's delta_t/delta_f FFT
scalings cancel end-to-end, so whitened output keeps pycbc's normalization:
whitened colored noise has std ~= sqrt(sample_rate).

TPU numerics: raw LIGO PSDs are O(1e-42) strain^2/Hz — far below the f32
normal range, and their inverse ASDs (1e21) overflow when squared. PyCBC
works in f64; TPUs do not. Whitening, however, is scale-invariant, and
inverse spectrum truncation is 1-homogeneous: IST(c*S) = c*IST(S). So every
public function here normalizes the PSD to O(1) internally (c = mean of the
in-band PSD) and folds the 1/sqrt(c) into the strain spectrum, keeping every
f32 intermediate in range with no loss of accuracy.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gwkit.ops.psd import interpolate_psd, welch_psd


def inverse_spectrum_truncation(
    psd: jnp.ndarray,
    max_filter_len: int,
    low_frequency_cutoff: Optional[float] = None,
    delta_f: float = 1.0,
    trunc_method: Optional[str] = "hann",
) -> jnp.ndarray:
    """Smooth a PSD by truncating its inverse-ASD impulse response in time.

    Bit-parity with pycbc.psd.inverse_spectrum_truncation: zero the inverse
    ASD at DC, Nyquist, and below the cutoff; irfft; keep only
    max_filter_len samples (hann-tapered) split across the start/end; rfft;
    return 1/|.|^2. Internally normalized (IST is 1-homogeneous) so f32
    handles strain-scale PSDs; the output is psd-scaled again, so pass PSDs
    whose scale is representable, or use the whiten_* functions which keep
    everything normalized.
    """
    core, c = _normalize_psd(psd)
    return _ist_core(core, max_filter_len, low_frequency_cutoff, delta_f, trunc_method) * c


def _normalize_psd(psd) -> Tuple[jnp.ndarray, "jnp.ndarray | float"]:
    """Scale the PSD to O(1): returns (psd/c, c) with c = mean of positive entries.

    Raw f64 numpy PSDs (O(1e-42)) are normalized host-side in f64 *before*
    the f32 device conversion — converting first would flush them subnormal.
    In that case ``c`` is returned as a PYTHON float (itself below the f32
    normal range!); use :func:`_sqrt_scale` to bring it on device.
    """
    if isinstance(psd, np.ndarray):
        pos = psd > 0
        c_np = float(psd[pos].mean()) if pos.any() else 1.0
        return jnp.asarray((psd / c_np).astype(np.float32)), c_np
    pos = psd > 0
    c = jnp.sum(jnp.where(pos, psd, 0.0), axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(pos, axis=-1, keepdims=True), 1
    )
    c = jnp.maximum(c, 1e-38)
    return psd / c, c


def _sqrt_scale(c) -> jnp.ndarray:
    """sqrt of the PSD scale, computed in f64 when c is a host float (1e-42
    is not f32-representable but its square root 1e-21 is)."""
    if isinstance(c, float):
        return jnp.float32(np.sqrt(c))
    return jnp.sqrt(c)


def _robust_rms(x: jnp.ndarray) -> jnp.ndarray:
    """RMS over the last axis that survives f32 subnormal flushing for 1e-21
    strain: peak-normalize before squaring."""
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    peak = jnp.maximum(peak, 1e-30)
    rms = peak * jnp.sqrt(jnp.mean((x / peak) ** 2, axis=-1, keepdims=True))
    return jnp.maximum(rms, 1e-30)


def _ist_core(
    psd: jnp.ndarray,
    max_filter_len: int,
    low_frequency_cutoff: Optional[float],
    delta_f: float,
    trunc_method: Optional[str],
) -> jnp.ndarray:
    flen = psd.shape[-1]
    n = (flen - 1) * 2
    inv_asd = jnp.where(psd > 0, 1.0 / jnp.sqrt(jnp.where(psd > 0, psd, 1.0)), 0.0)
    inv_asd = inv_asd.at[..., 0].set(0.0).at[..., -1].set(0.0)
    if low_frequency_cutoff is not None:
        kmin = int(low_frequency_cutoff / delta_f)
        inv_asd = inv_asd.at[..., :kmin].set(0.0)
    q = jnp.fft.irfft(inv_asd.astype(jnp.complex64), n, axis=-1)
    half = max_filter_len // 2
    if trunc_method == "hann":
        trunc_window = np.hanning(max_filter_len)
        q = q.at[..., :half].multiply(jnp.asarray(trunc_window[half:], q.dtype))
        q = q.at[..., n - half:].multiply(jnp.asarray(trunc_window[:half], q.dtype))
    q = q.at[..., half : n - half].set(0.0)
    trunc_asd = jnp.fft.rfft(q, axis=-1)
    mag_sq = trunc_asd.real ** 2 + trunc_asd.imag ** 2
    return 1.0 / jnp.maximum(mag_sq, 1e-30)


def whiten_estimate(
    strain: jnp.ndarray,
    delta_t: float = 1.0 / 2048.0,
    segment_duration: float = 0.5,
    max_filter_duration: float = 0.25,
    low_frequency_cutoff: Optional[float] = None,
    psd: Optional[jnp.ndarray] = None,
    remove_corrupted: bool = True,
    return_psd: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """MLGWSC-1 inference whitening (inference.py:56-137), batched over (..., N).

    PSD is Welch-median estimated from the data itself unless given. The
    returned series is cropped by max_filter_len//2 samples on each side
    (0.125 s at 2048 Hz) — callers must advance start_time accordingly
    (inference.py:244-246).
    """
    n = strain.shape[-1]
    sample_rate = 1.0 / delta_t
    delta_f = 1.0 / (n * delta_t)
    flen = n // 2 + 1
    # Whitening is invariant to an overall strain scale when the PSD is
    # estimated from the data; normalize to unit RMS so 1e-21 strain keeps
    # every f32 intermediate in range.
    rms = _robust_rms(strain.astype(jnp.float32))
    x = strain.astype(jnp.float32) / rms
    if psd is None:
        est = welch_psd(x, delta_t, segment_duration)  # (..., seg_flen)
        unprocessed = est * rms[..., :1] ** 2  # physical-scale PSD for callers
        est = interpolate_psd(est, 1.0 / segment_duration, delta_f, flen)
        core, c = _normalize_psd(est)
        inv_scale = 1.0 / jnp.sqrt(c)  # psd estimated from x: O(1) scale
    else:
        unprocessed = psd
        if isinstance(psd, jnp.ndarray) and psd.shape[-1] != flen:
            psd = interpolate_psd(psd, delta_f * (n // 2) / (psd.shape[-1] - 1), delta_f, flen)
        elif isinstance(psd, np.ndarray) and psd.shape[-1] != flen:
            grid_old = np.arange(psd.shape[-1]) * (1.0 / (2.0 * delta_t * (psd.shape[-1] - 1)))
            psd = np.interp(np.arange(flen) * delta_f, grid_old, psd)
        core, c_phys = _normalize_psd(psd)
        # strain was divided by rms; the physical PSD scale enters as its
        # (f32-representable) square root: 1/sqrt(c) = rms / sqrt(c_phys)
        inv_scale = rms / _sqrt_scale(c_phys)
    max_filter_len = int(max_filter_duration * sample_rate)
    core = _ist_core(core, max_filter_len, low_frequency_cutoff, delta_f, "hann")
    strain_f = jnp.fft.rfft(x, axis=-1)
    inv_amp = jnp.sqrt(1.0 / core) * inv_scale
    white = jnp.fft.irfft(strain_f * inv_amp, n, axis=-1).astype(strain.dtype)
    if remove_corrupted:
        white = white[..., max_filter_len // 2 : n - max_filter_len // 2]
    if return_psd:
        return white, unprocessed
    return white


def whiten_psd(
    strain: jnp.ndarray,
    psd: jnp.ndarray,
    delta_t: float,
    low_freq_cutoff: float = 20.0,
    max_filter_duration: float = 4.0,
) -> jnp.ndarray:
    """bnslib known-PSD whitening (bnslib.py:62-133), batched over (..., N).

    The PSD (one-sided, len N//2+1, matching delta_f) is truncated, the strain
    spectrum is zeroed below the cutoff and at Nyquist, divided by sqrt(PSD),
    and max_filter_len samples are cropped from both ends.
    """
    n = strain.shape[-1]
    sample_rate = 1.0 / delta_t
    delta_f = 1.0 / (n * delta_t)
    max_filter_len = int(max_filter_duration * sample_rate)
    core, c = _normalize_psd(psd)
    core = _ist_core(core, max_filter_len, low_freq_cutoff, delta_f, "hann")
    kmin = int(low_freq_cutoff / delta_f)
    strain_f = jnp.fft.rfft(strain.astype(jnp.float32), axis=-1)
    inv_amp = jnp.sqrt(1.0 / core) / _sqrt_scale(c)
    mask = (jnp.arange(n // 2 + 1) >= kmin) & (jnp.arange(n // 2 + 1) != n // 2)
    strain_f = jnp.where(mask, strain_f * inv_amp, 0.0)
    white = jnp.fft.irfft(strain_f, n, axis=-1).astype(strain.dtype)
    return white[..., max_filter_len : n - max_filter_len]
