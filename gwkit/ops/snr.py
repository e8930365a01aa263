"""Matched-filter SNR utilities.

Parity with bnslib's `optimal_snr` (bnslib.py:22-60), which wraps
pycbc.filter.sigma: the optimal SNR of a signal h against a one-sided noise
PSD S is  sigma = sqrt( 4 * delta_f * sum_k |h~_k|^2 / S_k )  over the band,
with h~ = delta_t * rfft(h) (continuous-FT convention). Network SNR is the
quadrature sum over detectors (MLGWSC-1/gen.py usage).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def sigma_sq(
    signal_td: jnp.ndarray,
    psd: jnp.ndarray,
    delta_t: float,
    low_freq_cutoff: Optional[float] = None,
    high_freq_cutoff: Optional[float] = None,
) -> jnp.ndarray:
    """sigma^2 of (..., N) time-domain signals against a one-sided PSD of
    length N//2+1. PSD bins <= 0 (below its own cutoff) are excluded."""
    n = signal_td.shape[-1]
    delta_f = 1.0 / (n * delta_t)
    hf = jnp.fft.rfft(signal_td.astype(jnp.float32), axis=-1) * delta_t
    freqs = np.arange(n // 2 + 1) * delta_f
    mask = np.ones(n // 2 + 1, bool)
    if low_freq_cutoff is not None:
        mask &= freqs >= low_freq_cutoff
    if high_freq_cutoff is not None:
        mask &= freqs < high_freq_cutoff
    mask_j = jnp.asarray(mask) & (psd > 0)
    integrand = jnp.where(mask_j, (hf.real ** 2 + hf.imag ** 2) / jnp.where(psd > 0, psd, 1.0), 0.0)
    return 4.0 * delta_f * jnp.sum(integrand, axis=-1)


def optimal_snr(signal_td, psd, delta_t, low_freq_cutoff=None, high_freq_cutoff=None):
    return jnp.sqrt(sigma_sq(signal_td, psd, delta_t, low_freq_cutoff, high_freq_cutoff))


def network_snr(per_detector_snrs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.square(per_detector_snrs), axis=axis))
