"""Month-scale honest end-to-end search bench (VERDICT r3 #1).

The product's stated job is a month-long continuous search
(reference: MLGWSC-1/inference.py:492-589 over month-scale files); this
script measures the longest honest configuration this box can hold:

1. Generates >=24 h of ds1 challenge foreground data on disk (skipped when
   the file already exists), in the exact challenge HDF5 layout.
2. Runs ONE search process over it — the same component-checkpoint path
   `gwkit-infer` uses when MS_CKPT_DIR holds the e2e capstone export, else
   a random-init task — at a PRODUCTION trigger threshold (default -0.5,
   the reference's USR operating point), with the trigger-harvest epilogue
   included in the measured wall.
3. Reports sustained x-realtime (wall-clock, epilogue included), the
   trigger-harvest + clustering cost as a fraction of wall, peak host RSS,
   and device HBM stats where the backend exposes them.

Env: MS_HOURS (24), MS_DIR (/tmp/monthscale), MS_CKPT_DIR (/tmp/e2e_imrd;
unset/absent -> random-init model at the 95%-quantile threshold),
MS_TARGET (512), MS_BATCH (128), MS_THRESHOLD (-0.5), MS_SEED (11).
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # kB -> GB


def ensure_data(path: str, hours: float, seed: int) -> None:
    import h5py

    if os.path.isfile(path):
        with h5py.File(path) as f:
            dets = sorted(f.keys())
            total = sum(f[dets[0]][k].shape[0] for k in f[dets[0]]) / 2048.0
        if total >= hours * 3600.0 * 0.95:
            print(f"reusing {path}: {total / 3600.0:.1f} h on disk")
            return
    from gwkit.data.generate import generate_challenge_data

    os.makedirs(os.path.dirname(path), exist_ok=True)
    bg = path.replace("fg", "bg")
    inj = path.replace("fg", "inj")
    t0 = time.time()
    generate_challenge_data(
        path, bg, inj, duration=hours * 3600.0, seed=seed, dataset=1)
    print(f"generated {hours:.0f} h ds1 challenge data in {time.time() - t0:.0f}s")


def main():
    import h5py
    import jax
    import jax.numpy as jnp

    hours = float(os.environ.get("MS_HOURS", "24"))
    base = os.environ.get("MS_DIR", "/tmp/monthscale")
    ckpt = os.environ.get("MS_CKPT_DIR", "/tmp/e2e_imrd")
    target = int(os.environ.get("MS_TARGET", "512"))
    batch = int(os.environ.get("MS_BATCH", "128"))
    threshold = float(os.environ.get("MS_THRESHOLD", "-0.5"))
    qstream = os.environ.get("MS_QSCAN_STREAM", "0") == "1"  # streaming Q-scan (lever 4)
    seed = int(os.environ.get("MS_SEED", "11"))
    fg = os.path.join(base, "fg_monthscale.hdf")

    print(f"devices: {jax.devices()}")
    ensure_data(fg, hours, seed)

    from gwkit.search.engine import get_triggers, write_search_output

    run = os.path.join(ckpt, "run")
    if os.path.isdir(run):
        from gwkit.cli.inference import load_task_from_components

        pre = os.path.join(ckpt, "encoder_pretrained.npz")
        task = load_task_from_components(
            lora_weights=os.path.join(run, "best_lora_weights"),
            dense_weights=os.path.join(run, "best_dense_layers.npz"),
            adapter_weights=os.path.join(run, "best_adapter.npz"),
            pretrained_encoder=pre if os.path.isfile(pre) else None,
            target_shape=(80, target), usr=True)
        model_src = f"trained capstone components ({run})"
    else:
        from gwkit.models.qadapter import QAdapterConfig
        from gwkit.models.whisper import config_for
        from gwkit.train.tasks import build_mlgwsc

        on_tpu = jax.devices()[0].platform != "cpu"
        enc = config_for(
            "tiny", compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            use_flash_attention=on_tpu, fused_block=on_tpu, gelu_approx=True,
            max_positions=target // 2)
        task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                            qcfg=QAdapterConfig(median_stride=8,
                                                target_shape=(80, target)),
                            usr=True)
        model_src = "random-init (no checkpoint dir); threshold from 95% score quantile"

    with h5py.File(fg) as f:
        dets = sorted(f.keys())
        n_segs = len(f[dets[0]].keys())
        total = sum(f[dets[0]][k].shape[0] for k in f[dets[0]]) / 2048.0
    print(f"{fg}: {total / 3600.0:.2f} h/detector in {n_segs} segments; model: {model_src}")

    # warm pass over a SHORT slice only (compiles); measured pass is cold-ish
    # on the data but warm on executables — the honest steady state.
    warm_src = os.path.join(base, "warm_slice.hdf")
    with h5py.File(fg) as f, h5py.File(warm_src, "w") as g:
        for det in dets:
            gd = g.create_group(det)
            key = max(f[det], key=lambda k: f[det][k].shape[0])
            ds = f[det][key]
            n = min(ds.shape[0], int(600 * 2048))
            out = gd.create_dataset(key, data=ds[:n])
            for a, v in ds.attrs.items():
                out.attrs[a] = v
    trig_w, vals_w, _ = get_triggers(task, warm_src, trigger_threshold=1e9,
                                     batch_size=batch, qscan_stream=qstream)
    if "random-init" in model_src and "MS_THRESHOLD" not in os.environ:
        threshold = float(np.quantile(vals_w, 0.95))
        print(f"random-init model: production-equivalent threshold = "
              f"95% quantile = {threshold:.3f}")

    # pass 1 carries the one-time per-tail-geometry XLA compiles (one per
    # distinct segment length); pass 2 is the sustained steady state a
    # month-long search spends its life in (reads + device, all warm).
    t0 = time.time()
    get_triggers(task, fg, trigger_threshold=threshold, batch_size=batch,
                 qscan_stream=qstream)
    first_wall = time.time() - t0
    t0 = time.time()
    triggers, all_vals, result = get_triggers(
        task, fg, trigger_threshold=threshold, batch_size=batch,
        qscan_stream=qstream)
    search_wall = time.time() - t0
    n_trig = sum(len(v) for v in triggers.values())

    t1 = time.time()
    out_path = os.path.join(base, "events_monthscale.hdf")
    write_search_output(out_path, triggers, all_vals)
    cluster_wall = time.time() - t1
    with h5py.File(out_path) as f:
        n_events = f["time"].shape[0]

    wall = search_wall + cluster_wall
    x_rt = result.strain_seconds / wall
    hbm = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = {k: round(v / 1e9, 3) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception as e:  # backend may not expose memory_stats
        hbm = {"unavailable": str(e)}

    summary = {
        "hours": round(result.strain_seconds / 3600.0, 2),
        "segments": n_segs,
        "windows": result.n_windows,
        "threshold": threshold,
        "raw_triggers": n_trig,
        "clustered_events": n_events,
        "first_pass_wall_s": round(first_wall, 1),
        "x_realtime_first_pass": round(result.strain_seconds / first_wall, 1),
        "search_wall_s": round(search_wall, 1),
        "cluster_wall_s": round(cluster_wall, 2),
        "epilogue_frac_pct": round(100 * cluster_wall / wall, 2),
        "x_realtime_incl_epilogue": round(x_rt, 1),
        "x_realtime_engine_timed": round(result.throughput_x_realtime, 1),
        "peak_host_rss_gb": round(_peak_rss_gb(), 2),
        "hbm_gb": hbm,
        "model": model_src,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
