"""bf16 scoring-path parity validation vs full f32 (VERDICT r3 #2, r4 #7).

BASELINE.md's rebuild target says "fp32", while every headline throughput
number computes in bf16 (f32 softmax/LN) on TPU. This gate mirrors
scripts/validate_int8.py on the SAME trained e2e capstone components, at
BOTH deployed geometries — the production serving shape (80,512) AND the
strict reference shape (80,3000), where the fused-block VMEM auto-split
engages a different kernel configuration (VERDICT r4 weak #6):

1. Classification: scores over the training corpus' validation split ->
   AUC both dtypes, score correlation, max delta.
2. Search (BF16_VAL_SEARCH=1): get_triggers over the challenge foreground
   both ways -> trigger-time Jaccard and per-trigger stat deltas.

Writes docs/results/bf16_parity.md. Env: BF16_VAL_DIR (default /tmp/e2e_imrd),
BF16_VAL_TARGETS (comma list, default "512,3000"), BF16_VAL_SECONDS (crop
the search span; 0 = all). The strict-geometry fp32 THROUGHPUT number
comes from ``BENCH_DTYPE=f32 BENCH_TARGET_FRAMES=3000 python bench.py``
(docs/PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_geometry(base: str, target: int) -> list:
    import h5py
    import jax
    import jax.numpy as jnp

    from gwkit.cli.inference import load_task_from_components
    from gwkit.data.datasets import InjectionDataset
    from gwkit.train.metrics import roc_auc

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
    task_bf16 = load_task_from_components(**kw, compute_dtype=jnp.bfloat16)
    task_f32 = load_task_from_components(**kw, compute_dtype=jnp.float32)

    with h5py.File(os.path.join(base, "train.hdf")) as f:
        valid = InjectionDataset.load(f, "validation", snr_range=(7.0, 20.0))

    @jax.jit
    def score_bf16(x):
        return task_bf16.forward(task_bf16.trainable, task_bf16.frozen, x)[:, 0]

    @jax.jit
    def score_f32(x):
        return task_f32.forward(task_f32.trainable, task_f32.frozen, x)[:, 0]

    key = jax.random.PRNGKey(0)
    s_b, s_f, labels = [], [], []
    for batch in valid.batches(key, 128, shuffle=False, drop_remainder=False):
        x, y = batch[0], batch[1]
        s_b.append(np.asarray(score_bf16(x)))
        s_f.append(np.asarray(score_f32(x)))
        labels.append(np.asarray(y[:, 0]))
    s_b = np.concatenate(s_b)
    s_f = np.concatenate(s_f)
    y = np.concatenate(labels)

    auc_b = roc_auc(y, s_b)
    auc_f = roc_auc(y, s_f)
    corr = float(np.corrcoef(s_f, s_b)[0, 1])
    delta = np.abs(s_b - s_f)
    span = float(s_f.max() - s_f.min())
    lines = [
        "",
        f"## Geometry (80,{target})"
        + (" — strict reference shape (fused-block VMEM auto-split path)"
           if target >= 3000 else " — production serving shape"),
        "",
        f"Validation split n={len(y)} at SNR U(7,20). f32 truth = the same",
        "task graph (fused kernels included) built at compute_dtype=float32.",
        "",
        "| metric | f32 | bf16 |",
        "|---|---|---|",
        f"| val AUC | {auc_f:.5f} | {auc_b:.5f} |",
        "",
        f"AUC delta {abs(auc_f - auc_b):.5f}; score correlation {corr:.6f}; "
        f"max |delta| {delta.max():.4f} "
        f"({100 * delta.max() / max(span, 1e-9):.2f}% of the f32 score span "
        f"{span:.2f}); mean |delta| {delta.mean():.4f}.",
    ]

    if os.environ.get("BF16_VAL_SEARCH", "1") == "1":
        from gwkit.search.engine import get_triggers

        fg = os.path.join(base, "fg.hdf")
        seconds = float(os.environ.get("BF16_VAL_SECONDS", "900"))
        src = fg
        if seconds > 0:
            src = "/tmp/bf16_val_fg.hdf"
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
        for name, task in (("f32", task_f32), ("bf16", task_bf16)):
            t0 = time.time()
            trig, _, _ = get_triggers(task, src, trigger_threshold=-0.5, verbose=False)
            flat = [t for seg_trigs in trig.values() for t in seg_trigs]
            res[name] = (np.asarray(flat, np.float64).reshape(-1, 2), time.time() - t0)
        t_f, t_b = res["f32"][0], res["bf16"][0]
        times_f = {round(float(t), 1) for t in t_f[:, 0]} if len(t_f) else set()
        times_b = {round(float(t), 1) for t in t_b[:, 0]} if len(t_b) else set()
        inter = len(times_f & times_b)
        union = max(len(times_f | times_b), 1)
        lines += [
            "",
            f"Search over {os.path.basename(src)}"
            + (f" (first {seconds:.0f}s)" if seconds else "")
            + f" at threshold -0.5: f32 {len(t_f)} triggers, bf16 {len(t_b)}; "
            f"trigger-time Jaccard {inter / union:.4f} "
            f"({inter}/{union} at 0.1 s resolution).",
        ]
    return lines


def main():
    base = os.environ.get("BF16_VAL_DIR", "/tmp/e2e_imrd")
    targets = [int(t) for t in
               os.environ.get("BF16_VAL_TARGETS", "512,3000").split(",")]
    run = os.path.join(base, "run")
    lines = [
        "# bf16 scoring-path parity vs f32 (the fp32 north-star wording gate)",
        "",
        f"Model: e2e capstone components ({run}); production USR threshold.",
    ]
    for target in targets:
        lines += run_geometry(base, target)
    lines += [
        "",
        "Throughput context: strict-geometry x-realtime at BENCH_DTYPE=f32 vs",
        "the bf16 default is recorded in docs/PERF.md (round 4); this report",
        "is the accuracy side of the BASELINE.md 'fp32' wording.",
    ]
    report = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "docs", "results", "bf16_parity.md")
    with open(path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
