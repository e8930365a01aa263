"""Capstone end-to-end MLGWSC-1 run on real hardware: train -> search -> evaluate.

1. Generate a physical training corpus (TaylorF2 + aLIGO design noise).
2. Train the MLGWSC model (Q-scan + Whisper encoder + DoRA) on chip.
3. Generate challenge foreground/background/injection files.
4. Run the continuous search over both (USR scores), cluster triggers.
5. Evaluate with the challenge protocol: FAR curve + sensitive distance.

Produces docs/results artifacts: stats.hdf numbers, sensitivity plot, and a
summary line. This is the full reference workflow (train.py -> inference.py
-> evaluate.py) on gwkit's TPU stack.

Env: E2E_TRAIN (default 6144), E2E_EPOCHS (12), E2E_DURATION (7200 s),
E2E_OUT (artifact dir, default /tmp/e2e_mlgwsc), E2E_SNR_LO/E2E_SNR_HI
(training injection band, default 7/20 — the efficiency run showed the
encoder trains cleanly down to SNR 5, which is where challenge injections
at Gpc distances live), E2E_PRETRAIN (InfoNCE steps on the same corpus
before supervised training, default 0 = off), E2E_DATASET (challenge
dataset 1-4 for the search/eval stages, default 1),
E2E_APPROXIMANT/E2E_SPIN_MAX/E2E_ISO_SPINS (training-corpus population —
e.g. imrphenomxphm/0.99/1 to train matched to the ds3/4 populations),
E2E_TIME_BUDGET_S (wall-clock training budget, 0 = off — matched-budget
encoder-size comparisons), E2E_ENCODER (tiny | base | ... — non-tiny arms
never overwrite the README headline ledger).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _update_headline(name: str, string: str, source: str) -> None:
    """Refresh the single-source headline ledger (docs/results/HEADLINE.json)
    this run's numbers; scripts/check_headlines.py (nightly stage) fails if
    README.md stops quoting them verbatim — VERDICT r4 #5."""
    path = os.path.join(REPO, "docs", "results", "HEADLINE.json")
    data = {}
    if os.path.isfile(path):
        with open(path) as f:
            data = json.load(f)
    data[name] = {"string": string, "source": source}
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)


def main():
    if os.environ.get("SMOKE_TPU", "1") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import h5py
    import jax
    import jax.numpy as jnp

    from gwkit.data.datasets import InjectionDataset
    from gwkit.data.generate import generate_challenge_data, generate_training_set
    from gwkit.evaluation.mlgwsc import find_injection_times, get_stats, read_events
    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.search.engine import get_triggers, write_search_output
    from gwkit.train.metrics import roc_auc
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.train.trainer import TrainConfig, Trainer

    n_train = int(os.environ.get("E2E_TRAIN", "6144"))
    epochs = int(os.environ.get("E2E_EPOCHS", "12"))
    duration = float(os.environ.get("E2E_DURATION", "7200"))
    out = os.environ.get("E2E_OUT", "/tmp/e2e_mlgwsc")
    target_frames = int(os.environ.get("E2E_TARGET", "512"))
    os.makedirs(out, exist_ok=True)
    print(f"devices: {jax.devices()}; out: {out}")

    # ---- 1. training corpus ----
    # E2E_APPROXIMANT/E2E_SPIN_MAX/E2E_ISO_SPINS select the training
    # population (e.g. imrphenomxphm + isotropic spins to train matched to
    # the ds3/4 challenge populations instead of the aligned ds1 default)
    corpus = os.path.join(out, "train.hdf")
    if not os.path.isfile(corpus):
        from gwkit.data.waveforms import SourceDistribution

        dist = SourceDistribution(
            approximant=os.environ.get("E2E_APPROXIMANT", "imrphenomd"),
            spin_max=float(os.environ.get("E2E_SPIN_MAX", "0")),
            isotropic_spins=os.environ.get("E2E_ISO_SPINS", "0") == "1",
        )
        t0 = time.time()
        generate_training_set(corpus, n_train=n_train, n_valid=n_train // 4, seed=3,
                              wave_duration=16.0, distribution=dist)
        print(f"corpus ({dist.approximant}) in {time.time()-t0:.0f}s")
    snr_lo = float(os.environ.get("E2E_SNR_LO", "7"))
    snr_hi = float(os.environ.get("E2E_SNR_HI", "20"))
    with h5py.File(corpus) as f:
        train_ds = InjectionDataset.load(f, "training", snr_range=(snr_lo, snr_hi))
        valid_ds = InjectionDataset.load(f, "validation", snr_range=(snr_lo, snr_hi))

    # ---- 2. train ----
    on_tpu = jax.devices()[0].platform != "cpu"
    enc_size = os.environ.get("E2E_ENCODER", "tiny")
    enc = config_for(enc_size, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                     use_flash_attention=on_tpu, fused_block=on_tpu, remat=True,
                     gelu_approx=on_tpu, max_positions=target_frames // 2)
    qcfg = QAdapterConfig(median_stride=8, target_shape=(80, target_frames))
    encoder_params = None
    pretrain_steps = int(os.environ.get("E2E_PRETRAIN", "0"))
    if pretrain_steps:
        from gwkit.train.checkpoints import load_pytree
        from gwkit.train.pretrain import ContrastivePretrainer

        pre_task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                                acfg=AdapterConfig(r=8, alpha=32, use_dora=True,
                                                   targets="qkvo"), qcfg=qcfg)
        enc_ckpt = os.path.join(out, "encoder_pretrained.npz")
        if os.path.isfile(enc_ckpt):
            encoder_params = jax.tree.map(
                np.asarray, load_pytree(enc_ckpt, pre_task.frozen["encoder"])[0])
            print(f"reusing pretrained encoder from {enc_ckpt}")
        else:
            t0 = time.time()
            pre = ContrastivePretrainer(pre_task, lr=1e-4, temperature=0.1,
                                        train_full_encoder=True, seed=0)
            pre.train(np.asarray(train_ds.noises), np.asarray(train_ds.waveforms),
                      steps=pretrain_steps,
                      batch_size=int(os.environ.get("E2E_PRETRAIN_BATCH", "256")),
                      snr_range=(snr_lo, snr_hi), outdir=out, log_every=500)
            encoder_params = jax.tree.map(np.asarray, pre_task.frozen["encoder"])
            print(f"pretrained {pretrain_steps} steps in {time.time()-t0:.0f}s")
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                        acfg=AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                        qcfg=qcfg, encoder_params=encoder_params)
    trainer = Trainer(
        task.loss_fn, task.trainable, task.frozen,
        TrainConfig(learning_rate=3e-4, clip_norm=100.0, epochs=epochs, batch_size=64,
                    early_stop_patience=epochs, optimizer="adam",
                    # E2E_TIME_BUDGET_S: matched-wall-clock model-size arms
                    # (e.g. base vs tiny at the same device-time spend)
                    time_budget_s=float(os.environ.get("E2E_TIME_BUDGET_S", "0"))),
        export_components=task.export_components,
    )

    def eval_metrics(epoch, trainable, val_aux):
        if not val_aux:  # tiny smokes: fewer valid samples than one batch
            return {}
        scores = np.concatenate([a["scores"] for a in val_aux])
        labels = np.concatenate([a["labels"] for a in val_aux])
        auc = roc_auc(labels, scores)
        print(f"epoch {epoch:04d}: val AUC {auc:.4f}", flush=True)
        return {"val_auc": auc}

    rundir = os.path.join(out, "run")
    best_ckpt = os.path.join(rundir, "best.npz")
    if os.environ.get("E2E_SKIP_TRAIN", "0") == "1" and os.path.isfile(best_ckpt):
        # reuse an already-trained run (e.g. to re-evaluate the same model on
        # a different challenge dataset via E2E_DATASET)
        from gwkit.train.checkpoints import load_pytree

        trainer.trainable = jax.tree.map(
            np.asarray, load_pytree(best_ckpt, task.trainable)[0])
        print(f"reusing trained weights from {best_ckpt}")
    else:
        t0 = time.time()
        trainer.fit(lambda k: train_ds.batches(k, 64),
                    lambda k: valid_ds.batches(k, 64, shuffle=False),
                    outdir=rundir, force=True, eval_callback=eval_metrics)
        print(f"trained in {time.time()-t0:.0f}s")

    # ---- 3. challenge data ----
    fg, bg, inj = (os.path.join(out, n) for n in ("fg.hdf", "bg.hdf", "inj.hdf"))
    # inj.hdf is written last -> it is the completion marker; a partial fg.hdf
    # from an interrupted run must not short-circuit regeneration
    if not os.path.isfile(inj):
        t0 = time.time()
        from gwkit.data.segments import restrict_segments, default_o3a_segments

        segs = restrict_segments(default_o3a_segments(), duration)
        # E2E_DATASET=3 evaluates on the precessing+higher-mode challenge
        # population (imrphenomxphm injections) — the reference's hard
        # datasets — with the same aligned-trained model
        e2e_ds = int(os.environ.get("E2E_DATASET", "1"))
        generate_challenge_data(fg, bg, inj, duration=duration, seed=11, segments=segs,
                                dataset=e2e_ds)
        print(f"challenge data (ds{e2e_ds}) in {time.time()-t0:.0f}s")

    # ---- 4. search (trained weights, USR scores) ----
    usr_task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                            acfg=AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                            qcfg=qcfg, usr=True, encoder_params=encoder_params)
    usr_task.trainable = trainer.trainable
    for name, path in (("fg", fg), ("bg", bg)):
        triggers, all_vals, result = get_triggers(
            usr_task, path, trigger_threshold=-0.5, batch_size=256,
        )
        write_search_output(os.path.join(out, f"{name}_events.hdf"), triggers, all_vals)
        print(f"{name}: {result.n_windows} windows at {result.throughput_x_realtime:.0f}x realtime, "
              f"{sum(len(v) for v in triggers.values())} triggers", flush=True)

    # ---- 5. evaluate ----
    dur, mask = find_injection_times([fg], inj, padding_start=30, padding_end=30)
    with h5py.File(inj) as f:
        injparams = {k: f[k][()][mask] for k in ("tc", "distance", "mass1", "mass2")}
    stats = get_stats(
        read_events([os.path.join(out, "fg_events.hdf")]),
        read_events([os.path.join(out, "bg_events.hdf")]),
        injparams, duration=dur, chirp_distance=False,
    )
    far_month = stats["far"] * 30 * 86400
    sd = stats["sensitive-distance"]
    # sensitive distance at FAR <= 1000/month and <= 100/month (challenge plot range)
    for far_target in (10000.0, 1000.0, 100.0):
        idx = np.searchsorted(-far_month, -far_target)
        if idx < len(sd):
            print(f"sensitive distance @ FAR<={far_target:g}/month: {sd[idx]:.1f} Mpc")
    print(f"n injections in span: {mask.sum()}, best sensitive fraction: "
          f"{stats['sensitive-fraction'].max():.3f}")
    idx100 = np.searchsorted(-far_month, -100.0)
    # only the flagship configuration (tiny encoder, ds1) owns the README
    # headline; ablation arms (base encoder, ds3/4) must not overwrite it
    if (idx100 < len(sd) and os.environ.get("E2E_HEADLINE", "1") == "1"
            and enc_size == "tiny"
            and int(os.environ.get("E2E_DATASET", "1")) == 1):
        _update_headline(
            "capstone_recovery",
            f"recovers {100 * stats['sensitive-fraction'].max():.1f}% of challenge injections",
            "scripts/e2e_mlgwsc.py (latest run; log: docs/results/e2e_mlgwsc_run.txt)")
        _update_headline(
            "capstone_sd_far100", f"{sd[idx100]:.1f} Mpc",
            "scripts/e2e_mlgwsc.py sensitive distance @ FAR<=100/month")
    with h5py.File(os.path.join(out, "stats.hdf"), "w") as f:
        for key, val in stats.items():
            f.create_dataset(key, data=np.asarray(val))
    try:
        from gwkit.utils.plotting import plot_sensitivity_vs_far

        plot_sensitivity_vs_far(stats["far"], sd, os.path.join(out, "sensitivity.png"))
    except Exception as e:
        print(f"plotting skipped: {e}")
    assert stats["sensitive-fraction"].max() > 0.1, "trained search found (almost) no injections"
    print("E2E MLGWSC OK")


if __name__ == "__main__":
    main()
