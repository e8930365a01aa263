"""Smoke drive: tiny end-to-end training run on synthetic separable data.

Drives the full training lifecycle at the package surface: dataset -> device
injection mixing -> fused front end + encoder + DoRA forward/backward ->
optimizer -> checkpoints -> early stop -> component export. Asserts the loss
decreases and AUC rises above chance.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("SMOKE_TPU", "0") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import jax

    from gwkit.data.datasets import InjectionDataset
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.whisper import WhisperConfig
    from gwkit.train.metrics import roc_auc
    from gwkit.train.tasks import build_signal_vs_noise
    from gwkit.train.trainer import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    n, d, t = 64, 2, 512  # short windows to keep CPU smoke fast
    noises = rng.normal(size=(n, d, t)).astype(np.float32)
    tt = np.linspace(0, 1, t)
    chirp = np.sin(2 * np.pi * (30 * tt + 150 * tt ** 2)) * np.hanning(t)
    waveforms = np.stack([np.stack([chirp, chirp])] * (n // 2)).astype(np.float32)
    waveforms += 0.05 * rng.normal(size=waveforms.shape).astype(np.float32)
    train_ds = InjectionDataset(noises=noises, waveforms=waveforms, snr_range=(8.0, 12.0))
    valid_ds = InjectionDataset(
        noises=rng.normal(size=(32, d, t)).astype(np.float32),
        waveforms=waveforms[:16], snr_range=(8.0, 12.0),
    )

    enc = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=1500)
    task = build_signal_vs_noise(
        jax.random.PRNGKey(0), encoder=enc,
        acfg=AdapterConfig(r=4, alpha=16, use_dora=True, targets="kv"),
        input_sample_rate=512, n_frames=256,
    )
    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(learning_rate=2e-3, epochs=3, batch_size=16, optimizer="adamw"),
        export_components=task.export_components,
    )

    with tempfile.TemporaryDirectory() as outdir:
        t0 = time.time()
        best = trainer.fit(
            lambda k: train_ds.batches(k, 16),
            lambda k: valid_ds.batches(k, 16, shuffle=False),
            outdir=outdir, force=True,
        )
        print(f"3 epochs in {time.time()-t0:.1f}s, best val loss {best:.4f}")
        losses = np.loadtxt(os.path.join(outdir, "losses.txt"))
        print("losses.txt:\n", losses)
        assert losses[-1, 2] < losses[0, 2] or losses[-1, 1] < losses[0, 1], "loss did not decrease"
        assert os.path.isdir(os.path.join(outdir, "best_lora_weights")), "peft export missing"
        assert os.path.isfile(os.path.join(outdir, "last.ckpt"))

        # AUC on validation
        key = jax.random.PRNGKey(1)
        scores, labels = [], []
        for batch in valid_ds.batches(key, 16, shuffle=False):
            _, aux = trainer._eval_step(trainer.trainable, batch)
            scores.append(np.asarray(aux["scores"]))
            labels.append(np.asarray(aux["labels"]))
        auc = roc_auc(np.concatenate(labels), np.concatenate(scores))
        print(f"val AUC after 3 epochs: {auc:.3f}")
        assert auc > 0.6, f"AUC {auc} not above chance"

        # resume path
        trainer2 = Trainer(
            task.loss_fn, task.trainable, task.frozen,
            TrainConfig(learning_rate=2e-3, epochs=4, batch_size=16, optimizer="adamw"),
        )
        best2 = trainer2.fit(
            lambda k: train_ds.batches(k, 16),
            lambda k: valid_ds.batches(k, 16, shuffle=False),
            outdir=outdir, resume="latest",
        )
        print(f"resume ok, best {best2:.4f}")
    print("SMOKE TRAIN OK")


if __name__ == "__main__":
    main()
