"""End-to-end training demonstration on real hardware.

Generates a physical training corpus (TaylorF2 waveforms projected onto
H1/L1, aLIGO-design colored noise, unit-network-SNR whitened windows), trains
the MLGWSC-1 model (Q-adapter + Whisper encoder + DoRA + head) for a few
epochs, and reports validation ROC-AUC. With a random-init encoder this
demonstrates the full optimization path learns (AUC >> 0.5); with pretrained
HF weights (--hf-checkpoint) it reproduces the reference's fine-tuning setup.

Run: python scripts/train_demo.py  (TPU by default; SMOKE_TPU=0 forces CPU)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("SMOKE_TPU", "1") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    # NB: do NOT enable the persistent compilation cache on the axon TPU
    # backend — it interacts badly with the remote-compile relay (hangs).
    import h5py
    import jax

    from gwkit.data.datasets import InjectionDataset
    from gwkit.data.generate import generate_training_set
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.train.metrics import roc_auc
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.train.trainer import TrainConfig, Trainer
    import jax.numpy as jnp

    n_train = int(os.environ.get("DEMO_TRAIN", "2048"))
    n_valid = int(os.environ.get("DEMO_VALID", "512"))
    epochs = int(os.environ.get("DEMO_EPOCHS", "12"))
    batch = int(os.environ.get("DEMO_BATCH", "32"))
    print(f"devices: {jax.devices()}")

    with tempfile.TemporaryDirectory() as d:
        corpus = os.path.join(d, "train.hdf")
        t0 = time.time()
        generate_training_set(corpus, n_train=n_train, n_valid=n_valid, seed=3, wave_duration=16.0)
        print(f"corpus generated in {time.time()-t0:.1f}s")
        with h5py.File(corpus) as f:
            train_ds = InjectionDataset.load(f, "training", snr_range=(8.0, 20.0))
            valid_ds = InjectionDataset.load(f, "validation", snr_range=(8.0, 20.0))
        print(f"train: {len(train_ds)} samples ({train_ds.n_waveforms} injections)")

        on_tpu = jax.devices()[0].platform != "cpu"
        # target_frames 3000 = reference/Whisper-checkpoint geometry; 512 = the
        # TPU-native geometry (the Q-adapter's (80,3000) is pure upsampling of
        # a 128^2 spectrogram — no information, 6x the encoder FLOPs)
        target_frames = int(os.environ.get("DEMO_TARGET", "3000"))
        # DEMO_ENCODER=base trains the bigger backbone (VMEM split-kernel
        # path when DEMO_FUSED=1); DEMO_FUSED=1 trains through the fused
        # whole-layer kernel's custom_vjp instead of flash+remat.
        enc = config_for(os.environ.get("DEMO_ENCODER", "tiny"),
                         compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                         use_flash_attention=on_tpu,
                         fused_block=on_tpu and os.environ.get("DEMO_FUSED", "0") == "1",
                         remat=os.environ.get("DEMO_FUSED", "0") != "1",
                         gelu_approx=on_tpu,
                         max_positions=target_frames // 2)
        task = build_mlgwsc(
            jax.random.PRNGKey(0), encoder=enc,
            acfg=AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
            qcfg=QAdapterConfig(median_stride=8, target_shape=(80, target_frames)),
        )
        trainer = Trainer(
            task.loss_fn, task.trainable, task.frozen,
            TrainConfig(learning_rate=3e-4, clip_norm=100.0, epochs=epochs,
                        batch_size=batch, early_stop_patience=epochs, optimizer="adam"),
            export_components=task.export_components,
        )

        aucs = []

        def eval_metrics(epoch, trainable, val_aux):
            scores = np.concatenate([a["scores"] for a in val_aux])
            labels = np.concatenate([a["labels"] for a in val_aux])
            auc = roc_auc(labels, scores)
            aucs.append(auc)
            print(f"epoch {epoch:04d}: val AUC {auc:.4f}")
            return {"val_auc": auc}

        outdir = os.path.join(d, "run")
        t0 = time.time()
        best = trainer.fit(
            lambda k: train_ds.batches(k, batch),
            lambda k: valid_ds.batches(k, batch, shuffle=False),
            outdir=outdir, force=True, eval_callback=eval_metrics,
        )
        dt = time.time() - t0
        steps = epochs * (len(train_ds) // batch)
        print(f"{epochs} epochs in {dt:.0f}s ({dt/max(steps,1):.2f}s/step), best val loss {best:.4f}")
        print(f"final val AUC {aucs[-1]:.4f} (epoch1 {aucs[0]:.4f})")
        assert aucs[-1] > 0.85, f"model failed to learn: AUC {aucs[-1]}"
        assert os.path.isdir(os.path.join(outdir, "best_lora_weights"))
    print("TRAIN DEMO OK")


if __name__ == "__main__":
    main()
