"""Efficiency_test training CLI (reference: Efficiency_test/src/train.py +
pars.py/scheduler_pars.py): run-indexed training with curriculum-learning SNR
schedules, per-epoch export, and optional in-training efficiency estimation."""
from __future__ import annotations

from argparse import ArgumentParser

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, build_encoder_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Curriculum-scheduled efficiency-test training.")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 InjectionDataset file (training/validation groups).")
    p.add_argument("-o", "--output", type=str, required=True)
    p.add_argument("--i-run", type=int, default=0, help="Run index (outputs under run_{i:04d}).")
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--scheduler", type=str, default="plateau",
                   choices=["plateau", "threshold", "epoch", "none"])
    p.add_argument("--snr-ladder", type=float, nargs="+",
                   default=[50, 40, 30, 25, 20, 15, 12, 10, 8, 7, 6, 5],
                   help="Upper SNR bounds of the curriculum (lower = upper - 5).")
    p.add_argument("--scheduler-patience", type=int, default=4)
    p.add_argument("--scheduler-threshold", type=float, default=1e-4)
    p.add_argument("--reset-optimizer", action="store_true",
                   help="Reset optimizer state on curriculum steps (tools.py:204-224).")
    p.add_argument("--n-frames", type=int, default=3000)
    p.add_argument("--input-sample-rate", type=int, default=2048)
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

    from gwkit.data.datasets import InjectionDataset
    from gwkit.train.curriculum import EpochCLScheduler, PlateauCLScheduler, ThresholdCLScheduler
    from gwkit.train.tasks import build_signal_vs_noise
    from gwkit.train.trainer import TrainConfig, Trainer

    with h5py.File(args.dataset, "r") as f:
        train_ds = InjectionDataset.load(f, "training")
        valid_ds = InjectionDataset.load(f, "validation")

    ladder = [(hi - 5.0, hi) for hi in args.snr_ladder]
    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed), encoder=build_encoder_config(args, args.n_frames),
        acfg=build_adapter_config(args),
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate, n_frames=args.n_frames,
    )
    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(learning_rate=args.learning_rate, epochs=args.epochs,
                    batch_size=args.batch_size, early_stop_patience=10 ** 9,
                    optimizer="adamw", clip_norm=0.0, seed=args.seed),
        export_components=task.export_components,
    )

    def on_step():
        for ds in (train_ds, valid_ds):
            ds.snrs(scheduler.current)
        if args.reset_optimizer:
            trainer.reset_optimizer()

    # construct first, then attach on_step (the base __init__ advances once)
    if args.scheduler == "plateau":
        scheduler = PlateauCLScheduler(ladder, patience=args.scheduler_patience,
                                       threshold=args.scheduler_threshold, allow_interrupt=True)
    elif args.scheduler == "threshold":
        scheduler = ThresholdCLScheduler(ladder, threshold=args.scheduler_threshold)
    elif args.scheduler == "epoch":
        scheduler = EpochCLScheduler(ladder, patience=args.scheduler_patience)
    else:
        scheduler = None
    if scheduler is not None:
        scheduler.on_step = on_step
        on_step()

    outdir = os.path.join(args.output, f"run_{args.i_run:04d}")
    trainer.fit(
        lambda k: train_ds.batches(k, args.batch_size),
        lambda k: valid_ds.batches(k, args.batch_size, shuffle=False, drop_remainder=False),
        outdir=outdir, force=args.force, scheduler=scheduler,
    )


if __name__ == "__main__":
    main()
