"""Per-epoch efficiency tables + plots over a finished run_efficiency.py run.

The reference ships one TAP-vs-SNR table PER EPOCH
(Efficiency_test/src/calculate_efficiencies.py writing
efficiencies/out_efficiencies_run_0000_epoch_00NN.txt) plus grid plots of
efficiency-vs-epoch (plot_efficiencies*.py). This script reproduces that
surface from the per-epoch checkpoints `state_e_NNNN.npz` that
gwkit.train.Trainer saves:

    python scripts/efficiency_per_epoch.py --outdir docs/results/efficiency_run \
        [--epochs 5,10,20,...] [--stride 10]

Reuses the trained task geometry from run_efficiency.py (n_frames=128) and
the same test corpus; each epoch sweep is one jitted scorer over the cached
device-resident corpus, so extra epochs cost ~a minute each, not a rerun.
"""
import argparse
import functools
import glob
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="docs/results/efficiency_run")
    p.add_argument("--datadir", default="/root/eff_data")
    p.add_argument("--epochs", default="", help="comma list; default: stride over all")
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--n-frames", type=int, default=128)
    p.add_argument("--eval-batch", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import h5py
    import jax
    import jax.numpy as jnp

    from gwkit.data.datasets import InjectionDataset
    from gwkit.evaluation.efficiency import EfficiencyEstimator, write_efficiency_table
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.tasks import build_signal_vs_noise

    run_dir = os.path.join(args.outdir, "run_0000")
    ckpts = {}
    for path in glob.glob(os.path.join(run_dir, "state_e_*.npz")):
        m = re.search(r"state_e_(\d+)\.npz$", path)
        if m:
            ckpts[int(m.group(1))] = path
    if not ckpts:
        raise SystemExit(f"no per-epoch checkpoints under {run_dir}")
    if args.epochs:
        epochs = [int(e) for e in args.epochs.split(",") if int(e) in ckpts]
    else:
        all_e = sorted(ckpts)
        epochs = all_e[:: args.stride]
        if all_e[-1] not in epochs:
            epochs.append(all_e[-1])

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    enc_cfg = config_for("tiny", compute_dtype=dtype, fused_block=on_tpu,
                         use_flash_attention=on_tpu, gelu_approx=True)
    acfg = AdapterConfig(r=8, alpha=32, use_dora=True, targets="kv")
    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed), encoder=enc_cfg, acfg=acfg,
        input_sample_rate=2048, n_frames=args.n_frames, n_detectors=1)

    with h5py.File(os.path.join(args.datadir, "eff_test.hdf"), "r") as f:
        g = f["training"]
        test_waves = g["waveforms"][()]
        test_noises = g["noises"][()]
    wave_ds = InjectionDataset(noises=test_noises[: len(test_waves)],
                               waveforms=test_waves)
    noise_ds = InjectionDataset(noises=test_noises,
                                waveforms=np.zeros((0,) + test_noises.shape[1:], np.float32))

    snrs = [5.0, 7.0, 9.0, 11.0, 13.0, 15.0]
    faps = (1e-1, 1e-2, 1e-3, 1e-4)
    eff_dir = os.path.join(args.outdir, "efficiencies")
    os.makedirs(eff_dir, exist_ok=True)

    # jit ONCE with the weights as a traced argument: a fresh @jax.jit
    # closure per epoch (with params captured as trace-time constants) would
    # recompile the identical graph for every checkpoint in the sweep
    @jax.jit
    def _score(params, x):
        return task.forward(params, task.frozen, x).reshape(-1)

    per_epoch = {}
    for epoch in epochs:
        params, _ = load_pytree(ckpts[epoch], task.trainable)
        score_fn = functools.partial(_score, params)

        est = EfficiencyEstimator(wave_ds, noise_ds, snrs,
                                  batch_size=args.eval_batch, faps=faps)
        t0 = time.time()
        eff = est(score_fn, seed=args.seed)
        per_epoch[epoch] = eff
        table = os.path.join(eff_dir, f"out_efficiencies_run_0000_epoch_{epoch:04d}.txt")
        write_efficiency_table(table, snrs, faps, eff)
        logging.info("epoch %04d swept in %.0fs -> %s", epoch, time.time() - t0, table)

    try:
        from gwkit.utils.plotting import plot_efficiency_curves, plot_efficiency_vs_epoch

        best_epoch = max(per_epoch, key=lambda e: per_epoch[e][:, 1].mean())
        plot_efficiency_curves(snrs, faps, per_epoch[best_epoch],
                               os.path.join(args.outdir, "efficiency_SNR.png"))
        fap_j = 1  # the reference's headline FAP 1e-2 column
        plot_efficiency_vs_epoch(
            sorted(per_epoch),
            np.stack([per_epoch[e][:, fap_j] for e in sorted(per_epoch)]),
            snrs, faps[fap_j],
            os.path.join(args.outdir, "efficiency_vs_epoch.png"))
        logging.info("plots written (best epoch %04d)", best_epoch)
    except Exception as exc:  # plotting is best-effort (headless matplotlib)
        logging.warning("plotting skipped: %s", exc)


if __name__ == "__main__":
    main()
