"""Assembled task models: front end -> Whisper encoder (+DoRA) -> head.

Functional equivalents of the reference's nn.Modules, with the front end
*inside* the jit graph:

  * two-channel signal-vs-noise (Signal_vs_Noise/src/model.py:4-29)
  * one-channel binary / Efficiency_test softmax variant (model.py:31-52,
    Efficiency_test/src/network.py:69-90)
  * glitch classifier (Glitch_classification/src/model.py:4-39)
  * CNN-head variant (model.py:57-85)
  * baseline flattened-mel MLP (Efficiency_test/src/network.py:4-23)
  * GWWhisperClassifier with Q-transform adapter — see gwkit.models.qadapter
    (MLGWSC-1/train.py:161-214)
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from gwkit.models.heads import (
    HEAD_DROPOUT,
    HEAD_WIDTHS,
    cnn_head_apply,
    init_cnn_head,
    init_mlp_head,
    mlp_head_apply,
)
from gwkit.models.whisper import WhisperConfig, encoder_apply
from gwkit.ops.mel import whisper_log_mel


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    encoder: WhisperConfig
    head: str = "two_channel"  # key into HEAD_WIDTHS, or "cnn"
    num_classes: int = 1
    n_detectors: int = 2
    pool: str = "last"  # "last" (reference default) | "mean" (inference.py:390)
    softmax: bool = False  # MLGWSC-1 training head; removable for USR scores


def init_head(key, cfg: ClassifierConfig):
    if cfg.head == "cnn":
        return init_cnn_head(key, cfg.num_classes)
    d_in = cfg.encoder.d_model * (cfg.n_detectors if cfg.head in ("two_channel", "gwwhisper") else 1)
    return init_mlp_head(key, d_in, HEAD_WIDTHS[cfg.head], cfg.num_classes)


def _pool(seq: jnp.ndarray, how: str) -> jnp.ndarray:
    return seq[:, -1, :] if how == "last" else jnp.mean(seq, axis=1)


def encode_embedding(
    cfg: ClassifierConfig, encoder_params, mel: jnp.ndarray, adapters=None
) -> jnp.ndarray:
    """mel (B, 80, T) -> pooled embedding (B, d_model)."""
    seq = encoder_apply(cfg.encoder, encoder_params, mel, adapters=adapters)
    return _pool(seq, cfg.pool).astype(jnp.float32)


def two_channel_apply(
    cfg: ClassifierConfig, params, mel0, mel1, adapters=None, dropout_key=None
) -> jnp.ndarray:
    """Two-detector classifier on precomputed mel features -> logits (B, num).

    Both detectors run through ONE encoder call (stacked on the batch axis);
    the reference makes two sequential calls (model.py:25-26) — same math.
    """
    B = mel0.shape[0]
    both = encode_embedding(cfg, params["encoder"], jnp.concatenate([mel0, mel1], axis=0), adapters)
    e0, e1 = both[:B], both[B:]
    emb = jnp.concatenate([e0, e1], axis=-1)
    if cfg.head == "cnn":
        return cnn_head_apply(params["head"], jnp.stack([e0, e1], axis=1))
    return mlp_head_apply(
        params["head"], emb,
        dropout_rate=HEAD_DROPOUT.get(cfg.head, 0.0), dropout_key=dropout_key,
        softmax=cfg.softmax,
    )


def one_channel_apply(
    cfg: ClassifierConfig, params, mel, adapters=None, dropout_key=None
) -> jnp.ndarray:
    emb = encode_embedding(cfg, params["encoder"], mel, adapters)
    return mlp_head_apply(
        params["head"], emb,
        dropout_rate=HEAD_DROPOUT.get(cfg.head, 0.0), dropout_key=dropout_key,
        softmax=cfg.softmax,
    )


def two_channel_from_audio(cfg: ClassifierConfig, params, audio0, audio1, adapters=None, dropout_key=None):
    """Full fused path: 16 kHz audio (B, N) per detector -> logits.

    The mel front end runs on device inside the same jit graph (the reference
    computed it per-sample on CPU DataLoader workers — SURVEY.md §3.1).
    """
    mel0 = whisper_log_mel(audio0)
    mel1 = whisper_log_mel(audio1)
    return two_channel_apply(cfg, params, mel0, mel1, adapters, dropout_key)


def one_channel_from_audio(cfg: ClassifierConfig, params, audio, adapters=None, dropout_key=None):
    return one_channel_apply(cfg, params, whisper_log_mel(audio), adapters, dropout_key)


def baseline_apply(params, mel0: jnp.ndarray, mel1: jnp.ndarray) -> jnp.ndarray:
    """BaselineModel: flatten both mels, concat, MLP (network.py:4-23)."""
    flat = jnp.concatenate(
        [mel0.reshape(mel0.shape[0], -1), mel1.reshape(mel1.shape[0], -1)], axis=-1
    )
    return mlp_head_apply(params, flat)
