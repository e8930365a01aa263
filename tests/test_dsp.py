"""DSP kernel golden/property tests: resample (vs scipy), Welch PSD,
inverse spectrum truncation (vs a direct numpy port of the pycbc algorithm),
and whitening statistics."""
import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from gwkit.ops.psd import aligo_zdhp_psd, median_bias, welch_psd
from gwkit.ops.resample import resample_fourier, resample_timeseries
from gwkit.ops.whiten import inverse_spectrum_truncation, whiten_estimate, whiten_psd


@pytest.mark.parametrize("n_in,n_out", [(2048, 16000), (16000, 2048), (4096, 1024), (1000, 3000)])
def test_resample_matches_scipy(rng, n_in, n_out):
    x = rng.normal(size=(3, n_in)).astype(np.float32)
    ref = scipy.signal.resample(x, n_out, axis=-1)
    ours = np.asarray(resample_fourier(jnp.asarray(x), n_out))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resample_timeseries_length():
    x = jnp.zeros((2, 2048))
    assert resample_timeseries(x).shape == (2, 16000)


def test_welch_psd_white_noise_level(rng):
    # White Gaussian noise with variance sigma^2 sampled at fs has one-sided
    # PSD = 2 sigma^2 / fs.
    fs, sigma = 2048.0, 3.0
    x = rng.normal(scale=sigma, size=(1, 2048 * 64)).astype(np.float32)
    psd = np.asarray(welch_psd(jnp.asarray(x), 1.0 / fs, segment_duration=0.5))[0]
    expected = 2.0 * sigma ** 2 / fs
    band = psd[10:-10]
    assert abs(np.median(band) / expected - 1.0) < 0.1


def test_median_bias_values():
    # median of n exponential periodograms is biased by sum_{i=1}^{n} (-1)^(i+1)/i
    assert median_bias(1) == 1.0
    assert abs(median_bias(3) - (1 - 1 / 2 + 1 / 3)) < 1e-12
    assert abs(median_bias(1000) - np.log(2)) < 1e-12


def _ist_numpy(psd, max_filter_len, low_frequency_cutoff, delta_f):
    """Direct numpy port of the pycbc inverse_spectrum_truncation algorithm
    (pycbc/psd/estimate.py), with the delta_t/delta_f fft scalings cancelled."""
    flen = len(psd)
    n = (flen - 1) * 2
    inv_asd = np.zeros(flen)
    pos = psd > 0
    inv_asd[pos] = 1.0 / np.sqrt(psd[pos])
    inv_asd[0] = 0.0
    inv_asd[-1] = 0.0
    if low_frequency_cutoff is not None:
        kmin = int(low_frequency_cutoff / delta_f)
        inv_asd[:kmin] = 0.0
    q = np.fft.irfft(inv_asd, n)
    half = max_filter_len // 2
    w = np.hanning(max_filter_len)
    q[:half] *= w[half:]
    q[n - half:] *= w[:half]
    q[half : n - half] = 0.0
    tr = np.fft.rfft(q)
    return 1.0 / np.maximum(np.abs(tr) ** 2, 1e-30)


def test_inverse_spectrum_truncation_matches_numpy_port():
    n = 4096
    delta_f = 2048.0 / n
    # Strain-scale (1e-42) PSD rescaled to O(1): IST is 1-homogeneous, and
    # the device op is f32 — raw strain-scale values live below the f32
    # normal range (the whiten_* wrappers normalize internally).
    psd = aligo_zdhp_psd(n // 2 + 1, delta_f, low_freq_cutoff=15.0) * 1e42
    ref = _ist_numpy(psd, 512, 20.0, delta_f)
    ours = np.asarray(
        inverse_spectrum_truncation(jnp.asarray(psd.astype(np.float32)), 512,
                                    low_frequency_cutoff=20.0, delta_f=delta_f)
    )
    # compare in log space (dynamic range spans many decades); f32 FFT chain
    np.testing.assert_allclose(np.log(ours), np.log(ref), rtol=0, atol=0.05)


def test_whiten_estimate_whitens(rng):
    """Colored Gaussian noise -> whiten_estimate -> approximately white with
    std ~= sqrt(sample_rate) (pycbc normalization), flat spectrum."""
    fs = 2048.0
    n = int(fs) * 32
    flen = n // 2 + 1
    delta_f = fs / n
    psd = aligo_zdhp_psd(flen, delta_f, low_freq_cutoff=15.0)
    # synthesize colored noise from the psd
    amp = np.sqrt(psd * n * fs / 4.0)
    re = rng.normal(size=flen) * amp
    im = rng.normal(size=flen) * amp
    spec = re + 1j * im
    spec[0] = 0
    spec[-1] = re[-1]
    colored = np.fft.irfft(spec, n).astype(np.float32) * (1.0 / fs * fs / n * n)  # scale-free check below
    colored = np.fft.irfft(spec, n).astype(np.float32)
    colored /= colored.std()
    colored *= np.sqrt(np.trapezoid(psd, dx=delta_f))  # unit-check not needed; shape matters

    white = np.asarray(
        whiten_estimate(jnp.asarray(colored[None]), delta_t=1.0 / fs, low_frequency_cutoff=20.0)
    )[0]
    assert white.shape[0] == n - 512  # max_filter_len//2 cropped each side
    # spectrum flatness: compare Welch PSD across two bands
    f, pxx = scipy.signal.welch(white, fs=fs, nperseg=2048)
    band1 = pxx[(f > 50) & (f < 200)].mean()
    band2 = pxx[(f > 300) & (f < 700)].mean()
    assert 0.5 < band1 / band2 < 2.0, f"whitened spectrum not flat: {band1/band2}"
    # pycbc normalization: std ~= sqrt(fs) x (in-band fraction); the 20 Hz
    # cut plus inverse-spectrum-truncation smoothing removes ~30% variance
    assert 0.6 * np.sqrt(fs) < white.std() < 1.3 * np.sqrt(fs)


def test_whiten_estimate_with_given_psd(rng):
    """The given-PSD branch (inference.py:76-83): raw f64 strain-scale PSDs
    must survive the f32 device conversion via host-side normalization."""
    fs, n = 2048.0, 2048 * 8
    flen = n // 2 + 1
    psd = aligo_zdhp_psd(flen, fs / n, low_freq_cutoff=15.0)  # f64, O(1e-42)
    x = (rng.normal(size=(2, n)) * 1e-21).astype(np.float32)
    out = np.asarray(
        whiten_estimate(jnp.asarray(x), delta_t=1.0 / fs, psd=psd, low_frequency_cutoff=20.0)
    )
    assert out.shape == (2, n - 512)
    assert np.isfinite(out).all()
    assert out.std() > 0


def test_welch_mean_method(rng):
    fs = 1024.0
    x = rng.normal(scale=2.0, size=(1, int(fs) * 16)).astype(np.float32)
    psd = np.asarray(welch_psd(jnp.asarray(x), 1.0 / fs, segment_duration=1.0, avg_method="mean"))[0]
    expected = 2.0 * 4.0 / fs
    assert abs(np.mean(psd[5:-5]) / expected - 1.0) < 0.1


def test_noise_generator_stream():
    from gwkit.data.noise import NoiseGenerator

    gen = NoiseGenerator(sample_rate=256.0, seed=3)
    out = gen.stream(total_duration=10.0, chunk_duration=4.0)
    assert out.shape == (int(256 * 10),)
    assert np.isfinite(out).all()


def test_whiten_psd_known_flat(rng):
    """With a flat PSD, whiten_psd only applies the bandpass + 1/sqrt(amp) scale."""
    fs, n = 2048.0, 8192
    x = rng.normal(size=(2, n)).astype(np.float32)
    amp = 4.0
    psd = np.full(n // 2 + 1, amp)
    out = np.asarray(
        whiten_psd(jnp.asarray(x), jnp.asarray(psd), delta_t=1.0 / fs, low_freq_cutoff=20.0,
                   max_filter_duration=1.0)
    )
    assert out.shape == (2, n - 2 * int(fs))
    # in-band content scaled by 1/sqrt(amp): compare variances (highpassed ref)
    sos = scipy.signal.butter(8, 30.0, "highpass", fs=fs, output="sos")
    ref = scipy.signal.sosfiltfilt(sos, x, axis=-1)[:, int(fs):-int(fs)] / np.sqrt(amp)
    assert abs(out.std() / ref.std() - 1.0) < 0.1
