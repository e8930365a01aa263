"""Q-Transform adapter: Q-scan -> 2D CNN -> adaptive pool -> FiLM.

Functional port of the reference's ``QTransformAdapter``
(MLGWSC-1/train.py:78-154; inference variant :303-351) with the Q-scan as a
fused device op (gwkit.ops.qtransform) instead of ml4gw's torch QScan.

The reference ships *different* geometries for train (spectrogram 128^2,
CNN widths 32/64/128) and inference (512^2, widths 16/32/64) — a latent
checkpoint-compatibility bug flagged in SURVEY.md §2.10. Here both are
expressible via ``QAdapterConfig`` and a single geometry is used end-to-end
by default (the train one); the inference widths remain available as the
``channels=(16, 32, 64)`` preset for loading reference-style checkpoints.

The adaptive average pool to ``target_shape`` reproduces torch
``AdaptiveAvgPool2d`` exactly via two static interpolation matrices
(each output cell averages input[floor(i*In/Out) : ceil((i+1)*In/Out)]),
i.e. two small matmuls on TPU.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gwkit.ops.qtransform import make_qplan, qscan


@dataclasses.dataclass(frozen=True)
class QAdapterConfig:
    kernel_length: float = 1.0
    sample_rate: int = 2048
    q_range: Tuple[float, float] = (4.0, 128.0)
    spectrogram_shape: Tuple[int, int] = (128, 128)
    target_shape: Tuple[int, int] = (80, 3000)
    n_detectors: int = 2
    channels: Tuple[int, int, int] = (32, 64, 128)  # train.py geometry; (16,32,64) = inference.py
    qscan_norm: str = "median"
    median_stride: int = 1  # >1: strided median estimate (see ops.qtransform.qscan)
    time_decimation: int = 1  # >1: exact spectral-fold decimation of tile energies


@functools.lru_cache(maxsize=8)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix implementing torch adaptive_avg_pool1d semantics."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d parity on (..., H, W)."""
    mh = jnp.asarray(_adaptive_pool_matrix(x.shape[-2], out_hw[0]))
    mw = jnp.asarray(_adaptive_pool_matrix(x.shape[-1], out_hw[1]))
    return jnp.einsum("oh,...hw,pw->...op", mh, x, mw)


def _conv2d_init(key, c_in, c_out, k):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(c_in * k * k)
    return {
        "w": jax.random.uniform(kw, (k, k, c_in, c_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def init_qadapter(key, cfg: QAdapterConfig):
    c1, c2, c3 = cfg.channels
    keys = jax.random.split(key, 4)
    return {
        "conv1": _conv2d_init(keys[0], 1, c1, 3),
        "conv2": _conv2d_init(keys[1], c1, c2, 3),
        "conv3": _conv2d_init(keys[2], c2, c3, 3),
        "conv4": _conv2d_init(keys[3], c3, 1, 1),
        "scale": jnp.ones((1,), jnp.float32),
        "bias": jnp.zeros((1,), jnp.float32),
        "film_gamma": jnp.ones((cfg.n_detectors,), jnp.float32),
        "film_beta": jnp.zeros((cfg.n_detectors,), jnp.float32),
    }


def _conv2d(x, p, padding):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + p["b"]


def _max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def qadapter_apply(cfg: QAdapterConfig, params, strain: jnp.ndarray) -> jnp.ndarray:
    """strain (B, D, T) -> Whisper-compatible features (B, D, F*, T*).

    The Q-scan is a fixed (non-learnable) transform — the reference wraps it
    in torch.no_grad (train.py:145-147); here it sits under stop_gradient.
    All detectors are folded into the batch axis (the reference loops over
    detectors in Python; on TPU one big batch keeps the MXU full).
    """
    B, D, T = strain.shape
    flat = strain.reshape(B * D, T)
    plan = make_qplan(cfg.kernel_length, float(cfg.sample_rate), cfg.q_range, cfg.spectrogram_shape)
    qspec = jax.lax.stop_gradient(
        qscan(flat, plan, norm=cfg.qscan_norm, median_stride=cfg.median_stride,
              time_decimation=cfg.time_decimation)
    )
    return qadapter_apply_spec(cfg, params, qspec.reshape(B, D, *qspec.shape[1:]))


def qadapter_apply_spec(cfg: QAdapterConfig, params, qspec: jnp.ndarray) -> jnp.ndarray:
    """Post-Q-scan half of :func:`qadapter_apply`: (B, D, F, T) precomputed Q
    spectrograms -> (B, D, F*, T*) Whisper-compatible features.

    Consumed by the streaming search front end (qscan_stream computes the
    spectrograms per chunk instead of per window); qadapter_apply routes its
    own qscan output through here so the two paths share the CNN/pool/FiLM
    math exactly."""
    B, D = qspec.shape[:2]
    x = qspec.reshape(B * D, *qspec.shape[2:])[..., None]  # (B*D, F, T, 1) NHWC
    x = jax.nn.relu(_conv2d(x, params["conv1"], ((1, 1), (1, 1))))
    x = _max_pool2(x)
    x = jax.nn.relu(_conv2d(x, params["conv2"], ((1, 1), (1, 1))))
    x = _max_pool2(x)
    x = jax.nn.relu(_conv2d(x, params["conv3"], ((1, 1), (1, 1))))
    x = _conv2d(x, params["conv4"], ((0, 0), (0, 0)))  # 1x1
    x = x[..., 0]  # (B*D, F', T')
    x = adaptive_avg_pool2d(x, cfg.target_shape)
    x = params["scale"] * x + params["bias"]
    x = x.reshape(B, D, *cfg.target_shape)
    gamma = params["film_gamma"][None, :, None, None]
    beta = params["film_beta"][None, :, None, None]
    return x * gamma + beta
