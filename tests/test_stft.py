"""Direct unit tests for gwkit.ops.stft (the mel front end's STFT core).

The module is otherwise pinned only transitively through the log-mel
golden-parity suite (tests/test_mel.py vs transformers); these tests pin
the primitives themselves against an independent numpy computation and
scipy's Hann window.
"""
import numpy as np
import scipy.signal

import jax
import jax.numpy as jnp

from gwkit.ops.stft import frame, hann_window, stft_power

# Tolerances are calibrated for the CPU backend's f32 FFT; TPU XLA f32 FFTs
# carry larger relative error (ADVICE r3), so loosen when the suite runs on
# the accelerator the framework targets.
_ON_CPU = jax.default_backend() == "cpu"
_BIN_RTOL = 2e-4 if _ON_CPU else 1e-3
_PARSEVAL_RTOL = 1e-5 if _ON_CPU else 1e-4


def test_hann_window_matches_scipy():
    # periodic Hann == scipy.signal.get_window('hann', N, fftbins=True)
    for n in (400, 256):
        ours = hann_window(n, periodic=True)
        ref = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(ours, ref, atol=1e-12)
    sym = hann_window(101, periodic=False)
    ref = scipy.signal.get_window("hann", 101, fftbins=False)
    np.testing.assert_allclose(sym, ref, atol=1e-12)


def test_frame_extracts_overlapping_windows():
    x = np.arange(32, dtype=np.float32)
    out = np.asarray(frame(jnp.asarray(x), num_frames=4, frame_length=8, hop=4))
    assert out.shape == (4, 8)
    for i in range(4):
        np.testing.assert_array_equal(out[i], x[i * 4 : i * 4 + 8])


def test_frame_batched_leading_axes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64)).astype(np.float32)
    out = np.asarray(frame(jnp.asarray(x), num_frames=5, frame_length=16, hop=8))
    assert out.shape == (2, 3, 5, 16)
    np.testing.assert_array_equal(out[1, 2, 3], x[1, 2, 24:40])


def test_stft_power_matches_numpy_reference():
    rng = np.random.default_rng(1)
    frame_length, hop, num_frames = 400, 160, 7
    T = (num_frames - 1) * hop + frame_length
    x = rng.normal(size=(2, T)).astype(np.float32)

    got = np.asarray(stft_power(jnp.asarray(x), num_frames, frame_length, hop))
    assert got.shape == (2, num_frames, frame_length // 2 + 1)

    win = hann_window(frame_length)
    for b in range(2):
        for i in range(num_frames):
            seg = x[b, i * hop : i * hop + frame_length] * win
            ref = np.abs(np.fft.rfft(seg)) ** 2
            np.testing.assert_allclose(got[b, i], ref, rtol=_BIN_RTOL, atol=1e-4)


def test_stft_power_parseval_energy():
    # sum over rfft power bins (with the conjugate-symmetric bins doubled)
    # equals N * windowed-frame energy — catches scaling regressions.
    rng = np.random.default_rng(2)
    frame_length, hop = 256, 128
    x = rng.normal(size=(1, 256 + 128)).astype(np.float64)
    p = np.asarray(stft_power(jnp.asarray(x), 2, frame_length, hop))
    win = hann_window(frame_length)
    for i in range(2):
        seg = x[0, i * hop : i * hop + frame_length] * win
        full = p[0, i, 0] + 2 * p[0, i, 1:-1].sum() + p[0, i, -1]
        # f32 on the jax side (x64 disabled) bounds the achievable tolerance
        np.testing.assert_allclose(full, frame_length * (seg**2).sum(), rtol=_PARSEVAL_RTOL)
