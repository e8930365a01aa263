"""Efficiency-sweep CLI (reference: Efficiency_test/src/calculate_efficiencies.py):
load per-epoch checkpoints, score in USR mode, write TAP-vs-SNR-vs-FAP tables."""
from __future__ import annotations

import glob
import os
from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Compute detection efficiencies (TAP vs SNR at fixed FAPs).")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 InjectionDataset file (training/validation groups).")
    p.add_argument("--checkpoint-dir", type=str, required=True,
                   help="Training output dir (state_e_*.npz / best.npz).")
    p.add_argument("-o", "--output-dir", type=str, required=True)
    p.add_argument("--snrs", type=float, nargs="+", default=[5, 7, 9, 11, 13, 15, 17, 19, 21, 23])
    p.add_argument("--faps", type=float, nargs="+", default=[1e-1, 1e-2, 1e-3, 1e-4])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=str, default="best",
                   help="'best', 'all', or comma-separated epoch numbers.")
    p.add_argument("--n-frames", type=int, default=3000)
    p.add_argument("--input-sample-rate", type=int, default=2048)
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output_dir)
    import h5py
    import jax

    from gwkit.data.datasets import InjectionDataset
    from gwkit.evaluation.efficiency import EfficiencyEstimator, write_efficiency_table
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.tasks import build_signal_vs_noise

    with h5py.File(args.dataset, "r") as f:
        ds = InjectionDataset.load(f, "validation" if "validation" in f else "training")
    # wave dataset: injections only; noise dataset: pure noise only
    m = ds.n_waveforms
    wave_ds = InjectionDataset(noises=np.asarray(ds.noises[:m]), waveforms=np.asarray(ds.waveforms))
    noise_ds = InjectionDataset(noises=np.asarray(ds.noises[m:]),
                                waveforms=np.zeros((0,) + ds.noises.shape[1:], np.float32))

    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed), encoder=args.encoder,
        acfg=build_adapter_config(args),
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate, n_frames=args.n_frames,
    )

    if args.epochs == "best":
        paths = [os.path.join(args.checkpoint_dir, "best.npz")]
    elif args.epochs == "all":
        paths = sorted(glob.glob(os.path.join(args.checkpoint_dir, "state_e_*.npz")))
    else:
        paths = [
            os.path.join(args.checkpoint_dir, f"state_e_{int(e):04d}.npz")
            for e in args.epochs.split(",")
        ]

    os.makedirs(args.output_dir, exist_ok=True)
    estimator = EfficiencyEstimator(wave_ds, noise_ds, args.snrs, args.batch_size, args.faps)
    for path in paths:
        trainable, _ = load_pytree(path, task.trainable)

        @jax.jit
        def score_fn(x, trainable=trainable):
            logits = task.forward(trainable, task.frozen, x)
            return logits.reshape(-1)  # USR: raw logit as ranking score

        eff = estimator(score_fn, seed=args.seed)
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output_dir, f"out_efficiencies_{name}.txt")
        write_efficiency_table(out, args.snrs, args.faps, eff)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
