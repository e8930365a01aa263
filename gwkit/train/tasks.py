"""Workload builders: assemble (frozen, trainable, loss_fn, forward) per task.

One builder per reference pipeline:
  * signal_vs_noise — two-detector strain -> resample -> log-mel -> encoder x2
    -> 2d-MLP head, BCE-with-logits (Signal_vs_Noise/src/train.py:138-326)
  * glitch — one-detector, 11-class CE head with dropout
    (Glitch_classification/src/train.py:88-200)
  * mlgwsc — raw strain -> Q-adapter -> encoder per detector -> softmax head,
    RegBCE (MLGWSC-1/train.py:161-214,478-640)
  * efficiency — one/two-channel softmax variant for the Efficiency_test
    pipeline (Efficiency_test/src/network.py:69-90)

Each returns a :class:`Task` whose ``loss_fn(trainable, frozen, batch, key)``
plugs straight into gwkit.train.trainer.Trainer. Front ends run inside the
loss graph on device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax

from gwkit.models.adapters import AdapterConfig, export_peft_dir, init_adapters
from gwkit.models.classifier import (
    ClassifierConfig,
    encode_embedding,
    init_head,
    mlp_head_apply,
    one_channel_apply,
    two_channel_apply,
)
from gwkit.models.qadapter import (
    QAdapterConfig,
    init_qadapter,
    qadapter_apply,
    qadapter_apply_spec,
)
from gwkit.models.whisper import WhisperConfig, config_for, init_encoder_params
from gwkit.ops.mel import whisper_log_mel
from gwkit.ops.resample import resample_timeseries
from gwkit.train.checkpoints import save_pytree
from gwkit.train.losses import bce_with_logits, cross_entropy, reg_bce


@dataclasses.dataclass
class Task:
    name: str
    cfg: ClassifierConfig
    acfg: AdapterConfig
    frozen: Any
    trainable: Any
    loss_fn: Callable  # (trainable, frozen, batch, key) -> (loss, aux)
    forward: Callable  # (trainable, frozen, inputs...) -> scores/logits
    qcfg: Optional[QAdapterConfig] = None
    # (trainable, frozen, strain) -> (B, D*d_model) pre-head embedding; used
    # by the InfoNCE contrastive pretrainer (any front end: Q-adapter or mel)
    embed: Optional[Callable] = None
    # (trainable, frozen, qspec (B, D, F, T)) -> scores; the post-Q-scan
    # forward used by the streaming (window-overlap-reuse) search front end
    forward_from_qspec: Optional[Callable] = None

    def export_components(self, outdir: str, trainable: Any) -> None:
        """Reference component-export surface (MLGWSC-1/train.py:723-737):
        peft-compatible LoRA dir + head state + (optional) Q-adapter state."""
        import os

        if "adapters" in trainable:
            export_peft_dir(
                os.path.join(outdir, "best_lora_weights"),
                trainable["adapters"], self.acfg, self.cfg.encoder.n_layers,
            )
        if "head" in trainable:
            save_pytree(os.path.join(outdir, "best_dense_layers.npz"), trainable["head"])
        if "qadapter" in trainable:
            save_pytree(os.path.join(outdir, "best_adapter.npz"), trainable["qadapter"])


def _split_trainable(key, enc_cfg, acfg, cfg, encoder_params=None):
    k_enc, k_ad, k_head = jax.random.split(key, 3)
    frozen_enc = encoder_params if encoder_params is not None else init_encoder_params(k_enc, enc_cfg)
    adapters = init_adapters(k_ad, enc_cfg, acfg, frozen_enc)
    head = init_head(k_head, cfg)
    return frozen_enc, adapters, head


def build_signal_vs_noise(
    key,
    encoder: str | WhisperConfig = "tiny",
    acfg: AdapterConfig = AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
    num_classes: int = 1,
    encoder_params=None,
    input_sample_rate: int = 2048,
    n_frames: int = 3000,
    n_detectors: int = 2,
    **enc_overrides,
) -> Task:
    """Binary classification on the speech log-mel front end.

    ``n_detectors=2`` is the two-channel H1/L1 model (Signal_vs_Noise/src/
    train.py); ``n_detectors=1`` is the single-detector variant (sd_train.py,
    Efficiency_test) using the one-channel head.

    ``n_frames`` < 3000 truncates Whisper's 30 s context: 1 s strain windows
    only occupy ~103 mel frames, so the reference pays ~29x dead attention/
    MLP compute on zero-padding. Shorter contexts slice the (sinusoidal)
    positional table and keep the architecture otherwise identical —
    pretrained-checkpoint parity requires the default 3000.
    """
    enc_cfg = encoder if isinstance(encoder, WhisperConfig) else config_for(encoder, **enc_overrides)
    if n_frames != 3000 and enc_cfg.max_positions > n_frames // 2:
        enc_cfg = dataclasses.replace(enc_cfg, max_positions=n_frames // 2)
    head_name = "two_channel" if n_detectors == 2 else "one_channel"
    cfg = ClassifierConfig(encoder=enc_cfg, head=head_name, num_classes=num_classes,
                           n_detectors=n_detectors)
    frozen_enc, adapters, head = _split_trainable(key, enc_cfg, acfg, cfg, encoder_params)
    frozen = {"encoder": frozen_enc}
    trainable = {"adapters": adapters, "head": head}

    def forward(trainable, frozen, strain):
        """strain (B, D, T@2048Hz) -> logits (B, num_classes)."""
        audio = resample_timeseries(strain, input_sample_rate, 16000)
        params = {"encoder": frozen["encoder"], "head": trainable["head"]}
        if n_detectors == 1:
            audio1 = audio[:, 0] if audio.ndim == 3 else audio
            mel = whisper_log_mel(audio1, pad_to=n_frames * 160, num_frames=n_frames)
            return one_channel_apply(cfg, params, mel, trainable["adapters"])
        mel0 = whisper_log_mel(audio[:, 0], pad_to=n_frames * 160, num_frames=n_frames)
        mel1 = whisper_log_mel(audio[:, 1], pad_to=n_frames * 160, num_frames=n_frames)
        return two_channel_apply(cfg, params, mel0, mel1, trainable["adapters"])

    def loss_fn(trainable, frozen, batch, key):
        x, y, snr = batch
        logits = forward(trainable, frozen, x)
        labels = y[:, 0]  # one-hot [1,0]=wave -> binary target 1
        loss = bce_with_logits(logits, labels)
        scores = jax.nn.sigmoid(logits.reshape(-1))
        return loss, {"scores": scores, "labels": labels}

    def embed(trainable, frozen, strain):
        """Pre-head embedding for InfoNCE pretraining: resample -> mel ->
        encoder per detector -> concat (the exact representation the
        supervised head consumes)."""
        audio = resample_timeseries(strain, input_sample_rate, 16000)
        if audio.ndim == 2:
            audio = audio[:, None, :]
        enc = trainable.get("encoder", frozen.get("encoder"))
        embs = [
            encode_embedding(
                cfg, enc,
                whisper_log_mel(audio[:, i], pad_to=n_frames * 160, num_frames=n_frames),
                trainable.get("adapters"))
            for i in range(n_detectors)
        ]
        import jax.numpy as jnp

        return jnp.concatenate(embs, axis=-1)

    return Task("signal_vs_noise", cfg, acfg, frozen, trainable, loss_fn, forward,
                embed=embed)


def build_glitch(
    key,
    encoder: str | WhisperConfig = "tiny",
    acfg: AdapterConfig = AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
    num_classes: int = 11,
    encoder_params=None,
    input_sample_rate: int = 2048,
    full_finetune: bool = False,
    n_frames: int = 3000,
    **enc_overrides,
) -> Task:
    """One-detector multi-class Gravity Spy glitch classification.

    ``full_finetune=True`` reproduces train_full_finetune.py: the encoder
    moves into the trainable pytree and no adapters are used.
    """
    enc_cfg = encoder if isinstance(encoder, WhisperConfig) else config_for(encoder, **enc_overrides)
    if n_frames != 3000 and enc_cfg.max_positions > n_frames // 2:
        enc_cfg = dataclasses.replace(enc_cfg, max_positions=n_frames // 2)
    cfg = ClassifierConfig(encoder=enc_cfg, head="glitch", num_classes=num_classes, n_detectors=1)
    frozen_enc, adapters, head = _split_trainable(key, enc_cfg, acfg, cfg, encoder_params)
    if full_finetune:
        frozen = {}
        trainable = {"encoder": frozen_enc, "head": head}
    else:
        frozen = {"encoder": frozen_enc}
        trainable = {"adapters": adapters, "head": head}

    def forward(trainable, frozen, strain, dropout_key=None):
        audio = resample_timeseries(strain, input_sample_rate, 16000)
        enc = trainable["encoder"] if full_finetune else frozen["encoder"]
        params = {"encoder": enc, "head": trainable["head"]}
        mel = whisper_log_mel(audio, pad_to=n_frames * 160, num_frames=n_frames)
        return one_channel_apply(cfg, params, mel, trainable.get("adapters"), dropout_key)

    def loss_fn(trainable, frozen, batch, key):
        x, labels = batch[0], batch[1]
        logits = forward(trainable, frozen, x, dropout_key=key)
        loss = cross_entropy(logits, labels)
        return loss, {"logits": logits, "labels": labels}

    return Task("glitch", cfg, acfg, frozen, trainable, loss_fn, forward)


def build_mlgwsc(
    key,
    encoder: str | WhisperConfig = "tiny",
    acfg: AdapterConfig = AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
    qcfg: QAdapterConfig = QAdapterConfig(),
    num_classes: int = 2,
    encoder_params=None,
    usr: bool = False,
    full_finetune: bool = False,
    **enc_overrides,
) -> Task:
    """GWWhisperClassifier: Q-adapter -> encoder per detector -> softmax head.

    ``usr=True`` removes the softmax (unbounded-score mode,
    inference.py:395-400) — used at search time. ``full_finetune=True``
    moves the encoder into the trainable pytree with no adapters (ablation
    arm; the reference recipe is adapters-only, train.py:496-504).
    """
    enc_cfg = encoder if isinstance(encoder, WhisperConfig) else config_for(encoder, **enc_overrides)
    cfg = ClassifierConfig(
        encoder=enc_cfg, head="gwwhisper", num_classes=num_classes,
        n_detectors=qcfg.n_detectors, softmax=not usr,
    )
    k_q, k_rest = jax.random.split(key)
    frozen_enc, adapters, head = _split_trainable(k_rest, enc_cfg, acfg, cfg, encoder_params)
    qadapter = init_qadapter(k_q, qcfg)
    if full_finetune:
        frozen = {}
        trainable = {"encoder": frozen_enc, "head": head, "qadapter": qadapter}
    else:
        frozen = {"encoder": frozen_enc}
        trainable = {"adapters": adapters, "head": head, "qadapter": qadapter}

    def forward(trainable, frozen, strain):
        """strain (B, D, T@2048) -> probs/logits (B, num_classes).

        Detectors fold into the batch axis for ONE encoder call (the
        reference loops a Python list over detectors, train.py:209-213 —
        identical math, but B*D keeps the MXU full); the (B, D*d_model)
        reshape reproduces the per-detector concat ordering.
        """
        B = strain.shape[0]
        D = qcfg.n_detectors
        feats = qadapter_apply(qcfg, trainable["qadapter"], strain)  # (B,D,80,3000)
        folded = feats.reshape(B * D, *feats.shape[2:])
        enc = trainable["encoder"] if full_finetune else frozen["encoder"]
        emb = encode_embedding(cfg, enc, folded, trainable.get("adapters"))
        emb = emb.reshape(B, D * emb.shape[-1])
        return mlp_head_apply(trainable["head"], emb, softmax=cfg.softmax)

    def loss_fn(trainable, frozen, batch, key):
        x, y = batch[0], batch[1]
        probs = forward(trainable, frozen, x)
        loss = reg_bce(probs, y)
        return loss, {"scores": probs[:, 0], "labels": y[:, 0]}

    def embed(trainable, frozen, strain):
        """Pre-head embedding (ContrastivePretrainer surface): Q-adapter ->
        encoder per detector -> concat, detectors folded into the batch."""
        import jax.numpy as jnp

        B = strain.shape[0]
        D = qcfg.n_detectors
        feats = qadapter_apply(qcfg, trainable["qadapter"], strain)
        folded = feats.reshape(B * D, *feats.shape[2:])
        enc = trainable.get("encoder", frozen.get("encoder"))
        emb = encode_embedding(cfg, enc, folded, trainable.get("adapters"))
        return emb.reshape(B, D * emb.shape[-1])

    def forward_from_qspec(trainable, frozen, qspec):
        """Like ``forward`` but from precomputed Q spectrograms (B, D, F, T)
        — the streaming search front end computes them per chunk
        (gwkit.ops.qtransform.qscan_stream) instead of per window."""
        B, D = qspec.shape[:2]
        feats = qadapter_apply_spec(
            qcfg, trainable["qadapter"], jax.lax.stop_gradient(qspec))
        folded = feats.reshape(B * D, *feats.shape[2:])
        enc = trainable["encoder"] if full_finetune else frozen["encoder"]
        emb = encode_embedding(cfg, enc, folded, trainable.get("adapters"))
        emb = emb.reshape(B, D * emb.shape[-1])
        return mlp_head_apply(trainable["head"], emb, softmax=cfg.softmax)

    return Task("mlgwsc", cfg, acfg, frozen, trainable, loss_fn, forward, qcfg=qcfg,
                embed=embed, forward_from_qspec=forward_from_qspec)
