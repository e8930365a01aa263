"""Workload builders: forward/loss/grad sanity at micro scale for all three
reference pipelines (signal_vs_noise, glitch, mlgwsc)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.models.adapters import AdapterConfig
from gwkit.models.qadapter import QAdapterConfig
from gwkit.models.whisper import WhisperConfig
from gwkit.train.tasks import build_glitch, build_mlgwsc, build_signal_vs_noise

ENC = WhisperConfig(d_model=32, n_heads=2, n_layers=1, d_ff=64, max_positions=128)
ACFG = AdapterConfig(r=2, alpha=4, use_dora=True, targets="kv")


def _grads_finite(task, batch, key):
    def loss_of(tr):
        loss, _ = task.loss_fn(tr, task.frozen, batch, key)
        return loss

    loss, grads = jax.value_and_grad(loss_of)(task.trainable)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    return loss, grads


def test_signal_vs_noise_task(rng):
    task = build_signal_vs_noise(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG,
                                 input_sample_rate=256, n_frames=128)
    x = jnp.asarray(rng.normal(size=(4, 2, 256)).astype(np.float32))
    y = jnp.asarray(np.tile(np.eye(2, dtype=np.float32), (2, 1)))
    snr = jnp.zeros(4)
    logits = task.forward(task.trainable, task.frozen, x)
    assert logits.shape == (4, 1)
    loss, grads = _grads_finite(task, (x, y, snr), jax.random.PRNGKey(1))
    # adapter grads must be nonzero (DoRA actually training); NB at init B=0
    # so dL/dA == 0 exactly — B and the magnitude carry the first update
    assert np.abs(np.asarray(grads["adapters"]["k"]["b"])).max() > 0
    assert np.abs(np.asarray(grads["adapters"]["k"]["m"])).max() > 0


def test_glitch_task(rng):
    task = build_glitch(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, num_classes=5,
                        input_sample_rate=256, n_frames=128)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    labels = jnp.asarray(np.array([0, 1, 2, 3]))
    logits = task.forward(task.trainable, task.frozen, x)
    assert logits.shape == (4, 5)
    _grads_finite(task, (x, labels), jax.random.PRNGKey(1))


def test_glitch_full_finetune_trains_encoder(rng):
    task = build_glitch(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, num_classes=3,
                        input_sample_rate=256, n_frames=128, full_finetune=True)
    assert "encoder" in task.trainable and not task.frozen
    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    labels = jnp.asarray(np.array([0, 1]))
    loss, grads = _grads_finite(task, (x, labels), jax.random.PRNGKey(1))
    assert np.abs(np.asarray(grads["encoder"]["layers"]["q"]["w"])).max() > 0


def test_mlgwsc_task_softmax_and_usr(rng):
    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, qcfg=qcfg)
    x = jnp.asarray(rng.normal(size=(2, 2, 2048)).astype(np.float32))
    probs = task.forward(task.trainable, task.frozen, x)
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    y = jnp.asarray(np.eye(2, dtype=np.float32))
    _grads_finite(task, (x, y), jax.random.PRNGKey(1))

    usr_task = build_mlgwsc(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, qcfg=qcfg, usr=True)
    usr_task.trainable = task.trainable  # same weights
    logits = usr_task.forward(task.trainable, task.frozen, x)
    # USR removes the softmax: softmax(logits) must reproduce the probs
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(logits, axis=-1)),
                               np.asarray(probs), rtol=1e-4, atol=1e-5)


def test_mlgwsc_detector_fold_matches_loop(rng):
    """The folded single encoder call must equal the reference's per-detector
    loop + concat."""
    from gwkit.models.classifier import encode_embedding
    from gwkit.models.heads import mlp_head_apply
    from gwkit.models.qadapter import qadapter_apply

    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, qcfg=qcfg)
    x = jnp.asarray(rng.normal(size=(2, 2, 2048)).astype(np.float32))
    folded = np.asarray(task.forward(task.trainable, task.frozen, x))

    feats = qadapter_apply(qcfg, task.trainable["qadapter"], x)
    embs = [
        encode_embedding(task.cfg, task.frozen["encoder"], feats[:, i], task.trainable["adapters"])
        for i in range(2)
    ]
    emb = jnp.concatenate(embs, axis=-1)
    looped = np.asarray(mlp_head_apply(task.trainable["head"], emb, softmax=True))
    np.testing.assert_allclose(folded, looped, rtol=1e-5, atol=1e-6)


def test_mlgwsc_full_finetune_arm(rng):
    """full_finetune=True moves the encoder into the trainable pytree (no
    adapters) and trains with finite grads — the ablation's comparison arm."""
    from gwkit.models.qadapter import QAdapterConfig

    qcfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(80, 128), channels=(4, 8, 8))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=ENC, acfg=ACFG, qcfg=qcfg,
                        full_finetune=True)
    assert "encoder" in task.trainable and "adapters" not in task.trainable
    assert task.frozen == {}
    x = jnp.asarray(rng.normal(size=(2, 2, 2048)).astype(np.float32))
    y = jnp.asarray(np.eye(2, dtype=np.float32))
    _grads_finite(task, (x, y), jax.random.PRNGKey(1))
