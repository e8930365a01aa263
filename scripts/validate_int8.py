"""int8 scoring-path parity validation (the gate for --int8 / BENCH_INT8).

Loads the e2e capstone's exported components twice — full-precision and
quant_int8 — and compares on the SAME inputs:

1. Classification: scores over the training corpus' validation split at a
   fixed injection SNR band -> AUC both paths, score correlation, max delta.
2. Search (INT8_VAL_SEARCH=1): get_triggers over the challenge foreground
   file both ways -> trigger-set overlap and per-trigger stat deltas.

Writes docs/results/int8_parity.md. Env: INT8_VAL_DIR (default /tmp/e2e_imrd),
INT8_VAL_TARGET (3000), INT8_VAL_SECONDS (limit the search to the first N
seconds of the foreground file; 0 = all).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import h5py
    import jax

    from gwkit.cli.inference import load_task_from_components
    from gwkit.data.datasets import InjectionDataset
    from gwkit.train.metrics import roc_auc

    base = os.environ.get("INT8_VAL_DIR", "/tmp/e2e_imrd")
    target = int(os.environ.get("INT8_VAL_TARGET", "3000"))
    run = os.path.join(base, "run")
    pre = os.path.join(base, "encoder_pretrained.npz")
    kw = dict(
        lora_weights=os.path.join(run, "best_lora_weights"),
        dense_weights=os.path.join(run, "best_dense_layers.npz"),
        adapter_weights=os.path.join(run, "best_adapter.npz"),
        pretrained_encoder=pre if os.path.isfile(pre) else None,
        target_shape=(80, target),
        usr=True,
    )
    task_fp = load_task_from_components(**kw)
    task_q = load_task_from_components(**kw, quant_int8=True)

    with h5py.File(os.path.join(base, "train.hdf")) as f:
        valid = InjectionDataset.load(f, "validation", snr_range=(7.0, 20.0))

    import jax.numpy as jnp

    @jax.jit
    def score_fp(x):
        return task_fp.forward(task_fp.trainable, task_fp.frozen, x)[:, 0]

    @jax.jit
    def score_q(x):
        return task_q.forward(task_q.trainable, task_q.frozen, x)[:, 0]

    key = jax.random.PRNGKey(0)
    scores_fp, scores_q, labels = [], [], []
    for batch in valid.batches(key, 128, shuffle=False, drop_remainder=False):
        x, y = batch[0], batch[1]
        scores_fp.append(np.asarray(score_fp(x)))
        scores_q.append(np.asarray(score_q(x)))
        labels.append(np.asarray(y[:, 0]))
    s_fp = np.concatenate(scores_fp)
    s_q = np.concatenate(scores_q)
    y = np.concatenate(labels)

    auc_fp = roc_auc(y, s_fp)
    auc_q = roc_auc(y, s_q)
    corr = float(np.corrcoef(s_fp, s_q)[0, 1])
    delta = np.abs(s_q - s_fp)
    span = float(s_fp.max() - s_fp.min())
    lines = [
        "# int8 scoring-path parity (gate for --int8 / BENCH_INT8)",
        "",
        f"Model: e2e capstone components ({run}); geometry (80,{target});",
        f"validation split n={len(y)} at SNR U(7,20).",
        "",
        f"| metric | fp (bf16) | int8 |",
        f"|---|---|---|",
        f"| val AUC | {auc_fp:.5f} | {auc_q:.5f} |",
        "",
        f"score correlation {corr:.6f}; max |delta| {delta.max():.4f} "
        f"({100 * delta.max() / max(span, 1e-9):.2f}% of the fp score span "
        f"{span:.2f}); mean |delta| {delta.mean():.4f}.",
    ]

    if os.environ.get("INT8_VAL_SEARCH", "0") == "1":
        from gwkit.search.engine import get_triggers

        fg = os.path.join(base, "fg.hdf")
        seconds = float(os.environ.get("INT8_VAL_SECONDS", "0"))
        src = fg
        if seconds > 0:  # crop to a slice for a faster gate
            src = "/tmp/int8_val_fg.hdf"
            with h5py.File(fg) as f, h5py.File(src, "w") as g:
                for det in f:
                    gd = g.create_group(det)
                    k0 = sorted(f[det].keys())[0]
                    ds = f[det][k0]
                    n = int(seconds / ds.attrs.get("delta_t", 1 / 2048.0))
                    out = gd.create_dataset(k0, data=ds[:n])
                    for a, v in ds.attrs.items():
                        out.attrs[a] = v
        res = {}
        for name, task in (("fp", task_fp), ("int8", task_q)):
            t0 = time.time()
            trig, _, _ = get_triggers(task, src, trigger_threshold=-0.5, verbose=False)
            # get_triggers returns {segment_key: [[time, score], ...]};
            # flatten to one (n, 2) trigger table across segments
            flat = [t for seg_trigs in trig.values() for t in seg_trigs]
            res[name] = (np.asarray(flat, np.float64).reshape(-1, 2), time.time() - t0)
        t_fp, t_q = res["fp"][0], res["int8"][0]
        times_fp = {round(float(t), 1) for t in t_fp[:, 0]} if len(t_fp) else set()
        times_q = {round(float(t), 1) for t in t_q[:, 0]} if len(t_q) else set()
        inter = len(times_fp & times_q)
        union = max(len(times_fp | times_q), 1)
        lines += [
            "",
            f"Search over {os.path.basename(src)}"
            + (f" (first {seconds:.0f}s)" if seconds else "")
            + f": fp {len(t_fp)} triggers, int8 {len(t_q)}; "
            f"trigger-time Jaccard {inter / union:.4f} "
            f"({inter}/{union} at 0.1 s resolution).",
        ]

    lines += [
        "",
        "Throughput context: int8 gains only +0.4-0.7% end to end on this"
        " pipeline (docs/PERF.md round-3 sweep — it is not"
        " projection-matmul-bound), so the path stays opt-in"
        " (--int8 / BENCH_INT8); this report is the accuracy gate.",
    ]
    report = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "docs", "results", "int8_parity.md")
    with open(path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
