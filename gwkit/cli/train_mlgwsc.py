"""MLGWSC-1 training CLI (reference: MLGWSC-1/train.py): Q-adapter +
Whisper encoder + DoRA with optional InfoNCE contrastive pretraining."""
from __future__ import annotations

from argparse import ArgumentParser

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, build_encoder_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="GW-Whisper (Q-Scan) training")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset-dir", type=str, required=True)
    p.add_argument("-o", "--output-training", type=str, required=True)
    p.add_argument("--n-detectors", type=int, default=2)
    p.add_argument("--sample-rate", type=int, default=2048)
    p.add_argument("--spectrogram-shape", type=int, nargs=2, default=[128, 128])
    p.add_argument("--target-shape", type=int, nargs=2, default=[80, 3000])
    p.add_argument("--q-range", type=float, nargs=2, default=[4.0, 128.0])
    p.add_argument("--kernel-length", type=float, default=1.0)
    p.add_argument("--snr", type=float, nargs=2, default=(5.0, 15.0))
    p.add_argument("--learning-rate", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--clip-norm", type=float, default=100.0)
    p.add_argument("--early-stop-patience", type=int, default=10)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--resume", nargs="?", const="latest", default=None, choices=["latest", "best"])
    from gwkit.cli.common import add_mesh_arg

    add_mesh_arg(p)
    p.add_argument("--pretrain-steps", type=int, default=0, help="InfoNCE steps (0 to skip; reference default 60000).")
    p.add_argument("--pretrain-lr", type=float, default=1e-4)
    p.add_argument("--pretrain-temp", type=float, default=0.1)
    p.add_argument("--noise-only-prob", type=float, default=0.25)
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output_training)
    import glob
    import os

    import jax
    import numpy as np

    from gwkit.data.datasets import load_concat_datasets
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.train.pretrain import ContrastivePretrainer
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.train.trainer import TrainConfig, Trainer

    paths = sorted(
        p for p in glob.glob(os.path.join(args.dataset_dir, "*")) if os.path.isfile(p)
    )
    train_ds, valid_ds = load_concat_datasets(paths, snr_range=tuple(args.snr))

    qcfg = QAdapterConfig(
        kernel_length=args.kernel_length, sample_rate=args.sample_rate,
        q_range=tuple(args.q_range), spectrogram_shape=tuple(args.spectrogram_shape),
        target_shape=tuple(args.target_shape), n_detectors=args.n_detectors,
    )
    task = build_mlgwsc(
        jax.random.PRNGKey(args.seed),
        encoder=build_encoder_config(args, args.target_shape[1]),
        acfg=build_adapter_config(args), qcfg=qcfg, num_classes=args.num_classes,
        encoder_params=load_encoder_params(args, args.encoder),
    )

    if args.pretrain_steps > 0:
        pre = ContrastivePretrainer(
            task, lr=args.pretrain_lr, temperature=args.pretrain_temp, seed=args.seed
        )
        pre.train(
            np.asarray(train_ds.noises), np.asarray(train_ds.waveforms),
            steps=args.pretrain_steps, batch_size=min(128, args.batch_size),
            snr_range=tuple(args.snr), noise_only_prob=args.noise_only_prob,
            outdir=args.output_training, seed=args.seed,
        )

    from gwkit.cli.common import build_mesh

    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(
            learning_rate=args.learning_rate, clip_norm=args.clip_norm,
            epochs=args.epochs, batch_size=args.batch_size,
            early_stop_patience=args.early_stop_patience, optimizer="adam", seed=args.seed,
        ),
        export_components=task.export_components,
        mesh=build_mesh(args),
    )
    trainer.fit(
        lambda k: train_ds.batches(k, args.batch_size),
        lambda k: valid_ds.batches(k, max(32, args.batch_size), shuffle=False, drop_remainder=False),
        outdir=args.output_training, resume=args.resume, force=args.force,
    )


if __name__ == "__main__":
    main()
