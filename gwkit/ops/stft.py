"""Batched STFT primitives for TPU.

Framing is a static gather (XLA lowers it to efficient dynamic-slices);
the FFT runs over the last axis. All shapes static — compiles once.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def hann_window(length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window (matches transformers.audio_utils.window_function)."""
    n = length + 1 if periodic else length
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / (n - 1)))
    return win[:length].astype(np.float64)


def frame(x: jnp.ndarray, num_frames: int, frame_length: int, hop: int) -> jnp.ndarray:
    """Extract overlapping frames from (..., T) -> (..., num_frames, frame_length).

    The input must already be padded so every frame is in-bounds.
    """
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft_power(
    x: jnp.ndarray,
    num_frames: int,
    frame_length: int = 400,
    hop: int = 160,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """|STFT|^2 of pre-padded (..., T) input -> (..., num_frames, frame_length//2+1)."""
    if window is None:
        window = hann_window(frame_length)
    frames = frame(x, num_frames, frame_length, hop)
    frames = frames * jnp.asarray(window, dtype=x.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real * spec.real + spec.imag * spec.imag).astype(x.dtype)
