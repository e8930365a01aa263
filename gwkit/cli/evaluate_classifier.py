"""Classifier evaluation CLI.

Two modes (--task):
* ``signal`` (default; reference Signal_vs_Noise/src/evaluation.py):
  InjectionDataset test file, labels synthesized by on-device SNR mixing at
  each --snrs value -> per-SNR ROC-AUC with bootstrap bands, F1, plots.
* ``glitch`` (reference Glitch_classification/src/evaluate.py): flat
  'strain'/'labels' corpus, multi-class head -> accuracy, confusion
  matrix, per-class precision/recall/F1 report. Evaluates the same
  held-out leading slice gwkit-train-glitch reserved via --valid-fraction
  (pass 0 to score the full file, e.g. a dedicated test corpus).
"""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Evaluate a trained signal-vs-noise classifier (ROC/AUC/F1 + bootstrap).")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--dataset", type=str, required=True,
                   help="HDF5 InjectionDataset file with a 'validation' (or 'training') "
                        "group (signal task), or flat 'strain'/'labels' (glitch task).")
    p.add_argument("--checkpoint", type=str, required=True, help="Trainable checkpoint (.npz; e.g. best.npz).")
    p.add_argument("-o", "--output-dir", type=str, required=True)
    p.add_argument("--task", choices=("signal", "glitch"), default="signal",
                   help="signal: per-SNR ROC on an InjectionDataset; glitch: "
                        "confusion matrix + per-class report on a labeled corpus.")
    p.add_argument("--num-classes", type=int, default=11, help="Glitch classes (glitch task).")
    p.add_argument("--valid-fraction", type=float, default=0.1,
                   help="Glitch task: evaluate the leading fraction gwkit-train-glitch "
                        "held out (0 = the whole file).")
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

    if args.task == "glitch":
        return _evaluate_glitch(args)

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


def _evaluate_glitch(args):
    """Glitch_classification/src/evaluate.py parity: accuracy + confusion
    matrix + per-class report on the held-out split of a 'strain'/'labels'
    corpus (the layout gwkit-generate-data glitch writes)."""
    import os

    import h5py
    import jax

    from gwkit.cli.common import build_adapter_config, load_encoder_params
    from gwkit.data.glitch import GLITCH_CLASSES
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.metrics import classification_report, confusion_matrix
    from gwkit.train.tasks import build_glitch

    with h5py.File(args.dataset, "r") as f:
        strain, labels = f["strain"][()], f["labels"][()]
    n_valid = int(len(labels) * args.valid_fraction)
    if n_valid:
        strain, labels = strain[:n_valid], labels[:n_valid]

    task = build_glitch(
        jax.random.PRNGKey(args.seed), encoder=args.encoder,
        acfg=build_adapter_config(args), num_classes=args.num_classes,
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=args.input_sample_rate, n_frames=args.n_frames,
    )
    trainable, _ = load_pytree(args.checkpoint, task.trainable)

    @jax.jit
    def pred_fn(x):
        return task.forward(trainable, task.frozen, x).argmax(axis=-1)

    preds = []
    for i in range(0, len(strain), args.batch_size):
        preds.append(np.asarray(pred_fn(strain[i: i + args.batch_size])))
    preds = np.concatenate(preds)

    names = list(GLITCH_CLASSES[: args.num_classes])
    cm = confusion_matrix(labels, preds, args.num_classes)
    acc = float((preds == labels).mean())
    report = (f"accuracy {acc:.4f} on {len(labels)} samples\n\n"
              + classification_report(labels, preds, names))
    print(report)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "evaluation.txt"), "w") as f:
        f.write(report + "\n")
    np.savetxt(os.path.join(args.output_dir, "confusion_matrix.txt"), cm, fmt="%d")


if __name__ == "__main__":
    main()
