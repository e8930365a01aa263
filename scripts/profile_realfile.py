"""Stage-timed breakdown of the real-file search: where does the wall time
go relative to the synthetic single-segment bench (bench.py)?

Walks the same engine stages as score_segments but with explicit sync
points so each stage's wall share is visible on a tunneled TPU:

  read      — h5py -> numpy (or C++ prefetch)
  h2d+slice — per-block jnp.asarray of raw strain
  dispatch  — Python-side fused-block dispatch enqueue
  compute   — device time (sync after all dispatches)
  collect   — D2H of score arrays + trigger thresholding

Env: RF_FILE (default /tmp/e2e_imrd/fg.hdf), RF_BATCH (1024),
RF_TARGET (512), RF_REPS (3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import h5py
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.search.slicer import DeviceSlicer, SlicerConfig, read_segments
    from gwkit.train.tasks import build_mlgwsc

    path = os.environ.get("RF_FILE", "/tmp/e2e_imrd/fg.hdf")
    batch = int(os.environ.get("RF_BATCH", "1024"))
    target = int(os.environ.get("RF_TARGET", "512"))
    reps = int(os.environ.get("RF_REPS", "3"))
    on_tpu = jax.devices()[0].platform != "cpu"
    enc = config_for("tiny", compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                     use_flash_attention=on_tpu, fused_block=on_tpu,
                     gelu_approx=True, max_positions=target // 2)
    qcfg = QAdapterConfig(median_stride=8, target_shape=(80, target))
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, qcfg=qcfg, usr=True)

    @jax.jit
    def score_fn(windows):
        return task.forward(task.trainable, task.frozen, windows)[:, 0]

    cfg = SlicerConfig(batch_size=batch)

    for rep in range(reps):
        label = "cold" if rep == 0 else f"warm{rep}"
        t0 = time.time()
        segments = read_segments(path)
        t_read = time.time() - t0
        strain_seconds = sum(s.strain.shape[1] * s.delta_t for s in segments)

        t_dispatch = t_sync = t_collect = 0.0
        n_windows = 0
        for seg in segments:
            slicer = DeviceSlicer(seg, cfg)
            assert slicer._blocked, "profile targets the blocked path"
            td0 = time.time()
            pending = list(slicer.fused_scores(score_fn))
            t_dispatch += time.time() - td0

            ts0 = time.time()
            # force completion of every dispatched block
            for dev_scores, _, _ in pending:
                jax.block_until_ready(dev_scores)
            float(jnp.sum(pending[-1][0]))  # fetch-forced (PJRT early-return)
            t_sync += time.time() - ts0

            tc0 = time.time()
            for dev_scores, times, valid in pending:
                scores = np.asarray(dev_scores).reshape(-1)[: len(valid)]
                _ = scores[valid]
            t_collect += time.time() - tc0
            n_windows += len(slicer)
        wall = time.time() - t0
        print(f"{label:6s}: total {wall:6.1f}s = read {t_read:5.2f} + "
              f"dispatch {t_dispatch:6.2f} + device-wait {t_sync:6.2f} + "
              f"collect {t_collect:5.2f}  "
              f"({strain_seconds / wall:6.1f}x realtime, {n_windows} windows)",
              flush=True)


if __name__ == "__main__":
    main()
