"""Glitch-classification training CLI (reference: Glitch_classification/src/
train.py and train_full_finetune.py): 11-way classifier with DoRA or full
fine-tuning, classification report + confusion matrix on the best epoch."""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_adapter_args, add_common_args, add_mesh_arg, build_adapter_config, build_encoder_config, build_mesh, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Train the multi-class glitch classifier.")
    add_common_args(p)
    add_mesh_arg(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 with 'strain' [N,T] and integer 'labels' [N].")
    p.add_argument("-o", "--output", type=str, required=True)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--early-stop-patience", type=int, default=60)
    p.add_argument("--num-classes", type=int, default=11)
    p.add_argument("--n-frames", type=int, default=3000)
    p.add_argument("--input-sample-rate", type=int, default=2048)
    p.add_argument("--full-finetune", action="store_true",
                   help="Train the whole encoder (train_full_finetune.py).")
    p.add_argument("--valid-fraction", type=float, default=0.2)
    p.add_argument("--augment", action="store_true",
                   help="On-device augmentation (time shift, sign flip, amplitude jitter).")
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output)
    import os

    import h5py
    import jax

    from gwkit.data.glitch import GLITCH_CLASSES, LabeledDataset
    from gwkit.train.metrics import classification_report, confusion_matrix, f1_scores
    from gwkit.train.tasks import build_glitch
    from gwkit.train.trainer import TrainConfig, Trainer

    with h5py.File(args.dataset, "r") as f:
        strain, labels = f["strain"][()], f["labels"][()]
    n_valid = int(len(labels) * args.valid_fraction)
    train_ds = LabeledDataset(strain[n_valid:], labels[n_valid:], augment=args.augment)
    valid_ds = LabeledDataset(strain[:n_valid], labels[:n_valid])

    task = build_glitch(
        jax.random.PRNGKey(args.seed), encoder=build_encoder_config(args, args.n_frames),
        acfg=build_adapter_config(args), num_classes=args.num_classes,
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate, full_finetune=args.full_finetune,
        n_frames=args.n_frames,
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

    best_f1 = [-1.0]

    def eval_metrics(epoch, trainable, val_aux):
        logits = np.concatenate([a["logits"] for a in val_aux])
        labels = np.concatenate([a["labels"] for a in val_aux])
        preds = logits.argmax(-1)
        cm = confusion_matrix(labels, preds, args.num_classes)
        stats = f1_scores(cm)
        print(f"epoch {epoch:04d}: acc {stats['accuracy']:.4f} macroF1 {stats['macro_f1']:.4f}")
        if stats["macro_f1"] > best_f1[0]:
            # Report/confusion artifacts track the best epoch, not the last
            # (reference train.py evaluates the best checkpoint).
            best_f1[0] = stats["macro_f1"]
            names = GLITCH_CLASSES[: args.num_classes]
            with open(os.path.join(args.output, "classification_report.txt"), "w") as f:
                f.write(f"best epoch {epoch:04d}\n\n" + classification_report(labels, preds, names))
            np.savetxt(os.path.join(args.output, "confusion_matrix.txt"), cm, fmt="%d")
            try:
                from gwkit.utils.plotting import plot_confusion_matrix

                plot_confusion_matrix(cm, names, os.path.join(args.output, "confusion_matrix.png"))
            except Exception:
                pass
        return {"val_accuracy": stats["accuracy"], "val_macro_f1": stats["macro_f1"]}

    os.makedirs(args.output, exist_ok=True)
    trainer.fit(
        lambda k: train_ds.batches(k, args.batch_size),
        lambda k: valid_ds.batches(k, args.batch_size, shuffle=False, drop_remainder=False),
        outdir=args.output, force=args.force, eval_callback=eval_metrics,
    )


if __name__ == "__main__":
    main()
