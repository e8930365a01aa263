"""Signal_vs_Noise training CLI (reference: Signal_vs_Noise/run_train.py +
src/train.py): two-detector binary classification with DoRA/LoRA."""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_adapter_args, add_common_args, add_mesh_arg, build_adapter_config, build_encoder_config, build_mesh, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Train the two-detector signal-vs-noise classifier.")
    add_common_args(p)
    add_mesh_arg(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 dataset file/dir with training/validation groups (InjectionDataset layout).")
    p.add_argument("-o", "--output", type=str, required=True, help="Output directory.")
    p.add_argument("--snr", type=float, nargs=2, default=(5.0, 15.0))
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--early-stop-patience", type=int, default=15)
    p.add_argument("--n-frames", type=int, default=3000,
                   help="Mel context length (3000 = Whisper/reference parity).")
    p.add_argument("--input-sample-rate", type=int, default=2048)
    p.add_argument("--detectors", type=int, default=2, choices=[1, 2],
                   help="2 = two-channel H1/L1 (src/train.py); 1 = single-detector (sd_train.py).")
    p.add_argument("--resume", nargs="?", const="latest", default=None, choices=["latest", "best"])
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output)
    import glob
    import os

    import jax

    from gwkit.data.datasets import load_concat_datasets
    from gwkit.train.metrics import binary_f1, roc_auc
    from gwkit.train.tasks import build_signal_vs_noise
    from gwkit.train.trainer import TrainConfig, Trainer

    paths = (
        sorted(glob.glob(os.path.join(args.dataset, "*")))
        if os.path.isdir(args.dataset)
        else [args.dataset]
    )
    train_ds, valid_ds = load_concat_datasets(paths, snr_range=tuple(args.snr))

    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed),
        encoder=build_encoder_config(args, args.n_frames),
        acfg=build_adapter_config(args),
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate,
        n_frames=args.n_frames,
        n_detectors=args.detectors,
    )
    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(
            learning_rate=args.learning_rate, epochs=args.epochs,
            batch_size=args.batch_size, early_stop_patience=args.early_stop_patience,
            optimizer="adamw", clip_norm=0.0, seed=args.seed,
        ),
        export_components=task.export_components,
        mesh=build_mesh(args),
    )

    def eval_metrics(epoch, trainable, val_aux):
        scores = np.concatenate([a["scores"] for a in val_aux])
        labels = np.concatenate([a["labels"] for a in val_aux])
        auc = roc_auc(labels, scores)
        f1 = binary_f1(labels, scores > 0.5)
        print(f"epoch {epoch:04d}: val AUC {auc:.4f} F1 {f1:.4f}")
        return {"val_auc": auc, "val_f1": f1}

    trainer.fit(
        lambda k: train_ds.batches(k, args.batch_size),
        lambda k: valid_ds.batches(k, max(32, args.batch_size), shuffle=False, drop_remainder=False),
        outdir=args.output, resume=args.resume, force=args.force,
        eval_callback=eval_metrics,
    )


if __name__ == "__main__":
    main()
