"""Classifier evaluation CLI (reference: Signal_vs_Noise/src/evaluation.py):
per-SNR test sets -> ROC-AUC with bootstrap bands, F1, plots."""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Evaluate a trained signal-vs-noise classifier (ROC/AUC/F1 + bootstrap).")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 InjectionDataset file with a 'validation' (or 'training') group.")
    p.add_argument("--checkpoint", type=str, required=True, help="Trainable checkpoint (.npz; e.g. best.npz).")
    p.add_argument("-o", "--output-dir", type=str, required=True)
    p.add_argument("--snrs", type=float, nargs="+", default=[6, 8, 10, 12, 15, 20],
                   help="Fixed SNRs to evaluate at (per-SNR ROC like evaluation.py:105-170).")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--bootstrap", type=int, default=1000, help="Bootstrap resamples for ROC bands.")
    p.add_argument("--n-frames", type=int, default=3000)
    p.add_argument("--input-sample-rate", type=int, default=2048)
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output_dir)
    import os

    import h5py
    import jax

    from gwkit.data.datasets import InjectionDataset
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.metrics import binary_f1, bootstrap_roc, roc_auc
    from gwkit.train.tasks import build_signal_vs_noise
    from gwkit.utils.plotting import plot_roc

    with h5py.File(args.dataset, "r") as f:
        group = "validation" if "validation" in f else "training"
        ds = InjectionDataset.load(f, group)

    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed), encoder=args.encoder,
        acfg=build_adapter_config(args),
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate, n_frames=args.n_frames,
    )
    trainable, _ = load_pytree(args.checkpoint, task.trainable)

    @jax.jit
    def score_fn(x):
        import jax.nn

        return jax.nn.sigmoid(task.forward(trainable, task.frozen, x).reshape(-1))

    os.makedirs(args.output_dir, exist_ok=True)
    report_lines = []
    for snr in args.snrs:
        ds.snrs((snr, snr))
        scores, labels = [], []
        key = jax.random.PRNGKey(args.seed)
        for x, y, _ in ds.batches(key, args.batch_size, shuffle=False, drop_remainder=False):
            scores.append(np.asarray(score_fn(x)))
            labels.append(np.asarray(y)[:, 0])
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        auc = roc_auc(labels, scores)
        f1 = binary_f1(labels, scores > 0.5)
        _, _, _, _, auc_samples = bootstrap_roc(labels, scores, n_resamples=args.bootstrap)
        lo, hi = np.percentile(auc_samples, [2.5, 97.5])
        line = f"SNR {snr:g}: AUC {auc:.4f} [{lo:.4f}, {hi:.4f}] F1 {f1:.4f}"
        print(line)
        report_lines.append(line)
        plot_roc(labels, scores, os.path.join(args.output_dir, f"roc_snr{snr:g}.png"))
    with open(os.path.join(args.output_dir, "evaluation.txt"), "w") as f:
        f.write("\n".join(report_lines) + "\n")


if __name__ == "__main__":
    main()
