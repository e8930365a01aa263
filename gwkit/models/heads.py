"""Task heads (Layer 3 tops) — functional JAX ports of every reference head.

Reference architectures (SURVEY.md §2.3):
  * two_channel  — Linear(2d,1024)/ReLU/1024->512->256->num (Signal_vs_Noise/src/model.py:4-29)
  * one_channel  — Linear(d,512)/ReLU/512->256->128->64->num (model.py:31-52)
  * glitch       — Linear(d,512)/ReLU/Dropout(.3) x3 ->128->11 (Glitch_classification/src/model.py:4-39)
  * gwwhisper    — Linear(d*D,512)->256->128->64->num [+ Softmax, removable]
                   (MLGWSC-1/train.py:188-199, inference.py:371-381)
  * cnn          — Conv1d stack over stacked embeddings (model.py:57-85)
  * baseline     — flattened-mel MLP (Efficiency_test/src/network.py:4-23)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gwkit.models.whisper import _linear_init

HEAD_WIDTHS = {
    "two_channel": (1024, 512, 256),
    "one_channel": (512, 256, 128, 64),
    "glitch": (512, 256, 128),
    "gwwhisper": (512, 256, 128, 64),
    "baseline": (1024, 512, 256),
}
HEAD_DROPOUT = {"glitch": 0.3}


def init_mlp_head(key, d_in: int, widths: Sequence[int], num_classes: int):
    dims = [d_in, *widths, num_classes]
    keys = jax.random.split(key, len(dims) - 1)
    return [ _linear_init(k, a, b) for k, a, b in zip(keys, dims[:-1], dims[1:]) ]


def mlp_head_apply(
    params,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_key=None,
    softmax: bool = False,
) -> jnp.ndarray:
    """ReLU MLP with optional inter-layer dropout and final softmax.

    Dropout placement matches the reference glitch head (after each ReLU).
    ``dropout_key=None`` => inference mode (no dropout).
    """
    n = len(params)
    for i, p in enumerate(params):
        x = x @ p["w"] + p["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
            if dropout_rate > 0.0 and dropout_key is not None:
                dropout_key, sub = jax.random.split(dropout_key)
                keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    if softmax:
        x = jax.nn.softmax(x, axis=-1)
    return x


def init_cnn_head(key, num_classes: int = 1, channels=(2, 64, 128, 256)):
    """TwoChannelLIGOBinaryClassifierCNN head (Signal_vs_Noise/src/model.py:57-85)."""
    keys = jax.random.split(key, len(channels))
    convs = []
    for k, (c_in, c_out) in zip(keys[:-1], zip(channels[:-1], channels[1:])):
        kw, kb = jax.random.split(k)
        bound = 1.0 / np.sqrt(c_in * 3)
        convs.append({
            "w": jax.random.uniform(kw, (3, c_in, c_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
        })
    return {"convs": convs, "out": _linear_init(keys[-1], channels[-1], num_classes)}


def cnn_head_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, 2, d_model) stacked per-detector embeddings -> (B, num_classes)."""
    h = jnp.swapaxes(x, -1, -2)  # (B, d_model, C) as NHC with H=d_model
    for p in params["convs"]:
        h = jax.lax.conv_general_dilated(
            h, p["w"], (1,), ((1, 1),), dimension_numbers=("NHC", "HIO", "NHC")
        ) + p["b"]
        h = jax.nn.relu(h)
    h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1) + Flatten
    return h @ params["out"]["w"] + params["out"]["b"]
