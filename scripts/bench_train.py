"""Training-step throughput bench: the MLGWSC DoRA recipe's jitted
train step (fused encoder forward + custom_vjp backward) at the reference
(80,3000) geometry, timed through Trainer.run_epoch (the production path,
deferred host syncs included).

Reports steps/s and the epoch-equivalent wall-clock for a reference-scale
200k-sample epoch — the comparable number to the reference's ~51 min/epoch
train on a DGX (SURVEY.md §6, Efficiency_test/src/output_Whisper.log).

Env: TRAIN_BENCH_BATCH (16), TRAIN_BENCH_TARGET (3000), TRAIN_BENCH_STEPS (20).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gwkit.models.adapters import AdapterConfig
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.train.tasks import build_mlgwsc
    from gwkit.train.trainer import TrainConfig, Trainer

    batch = int(os.environ.get("TRAIN_BENCH_BATCH", "16"))
    target = int(os.environ.get("TRAIN_BENCH_TARGET", "3000"))
    steps = int(os.environ.get("TRAIN_BENCH_STEPS", "20"))

    on_tpu = jax.devices()[0].platform != "cpu"
    enc = config_for("tiny", compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                     use_flash_attention=on_tpu, fused_block=on_tpu, remat=True,
                     gelu_approx=on_tpu, max_positions=target // 2)
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc,
                        acfg=AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                        qcfg=QAdapterConfig(target_shape=(80, target)))
    trainer = Trainer(task.loss_fn, task.trainable, task.frozen,
                      TrainConfig(learning_rate=3e-4, epochs=1, batch_size=batch,
                                  optimizer="adam", clip_norm=100.0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 2, 2048)).astype(np.float32) * 1e-21)
    lbl = (rng.random(batch) > 0.5).astype(np.float32)
    y = jnp.asarray(np.stack([lbl, 1.0 - lbl], axis=1))  # one-hot, BinaryGWDataset parity
    key = jax.random.PRNGKey(1)

    def epoch(n):
        return ((x, y) for _ in range(n))

    t0 = time.time()
    trainer.run_epoch(epoch(1), key, train=True)  # compile + warmup
    compile_s = time.time() - t0

    t0 = time.time()
    trainer.run_epoch(epoch(steps), key, train=True)
    dt = (time.time() - t0) / steps

    samples_s = batch / dt
    epoch_min = 200_000 / samples_s / 60.0
    print(f"compile {compile_s:.1f}s | step {dt*1e3:.1f} ms @ B={batch} T={target} "
          f"| {samples_s:.1f} samples/s | 200k-sample epoch: {epoch_min:.1f} min "
          f"(reference DGX: ~51 min)")


if __name__ == "__main__":
    main()
