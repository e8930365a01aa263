"""Stage profile of the STRICT reference-geometry search step
(target_frames=3000, time_decimation=1): Q-scan (d=1 vs d=4), Q-adapter,
encoder forward at T=1500, head, and the whole score_fn. Fetch-forced
timing (block_until_ready returns early on this PJRT backend — every timed
program reduces to a scalar that is float()'d).

Run ALONE on the TPU: any concurrent CPU load skews dispatch-driven wall
clock on this single-core host.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gwkit.models.qadapter import QAdapterConfig, qadapter_apply
    from gwkit.models.whisper import config_for, encoder_apply
    from gwkit.ops.qtransform import make_qplan, qscan
    from gwkit.train.tasks import build_mlgwsc

    B = int(os.environ.get("PROF_BATCH", "256"))  # windows; x2 detectors
    D = 2
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    target_frames = int(os.environ.get("PROF_TARGET_FRAMES", "3000"))
    deci = int(os.environ.get("PROF_TIME_DECIMATION", "1"))

    enc_cfg = config_for("tiny", compute_dtype=dtype, use_flash_attention=True,
                         fused_block=True, gelu_approx=True,
                         max_positions=target_frames // 2)
    qcfg = QAdapterConfig(median_stride=8, target_shape=(80, target_frames),
                          time_decimation=deci)
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc_cfg, qcfg=qcfg)

    rng = np.random.default_rng(0)
    strain = jnp.asarray(rng.normal(size=(B, D, 2048)).astype(np.float32))
    flat = strain.reshape(B * D, 2048)
    plan = make_qplan(1.0, 2048.0, (4.0, 128.0), (128, 128))

    def t(fn, x, n=8):
        # inputs passed as jit ARGUMENTS — capturing them as constants would
        # make XLA constant-fold the whole program on the (1-core) host
        jfn = jax.jit(fn)
        float(jfn(x))  # compile + settle
        float(jfn(x))
        t0 = time.time()
        for _ in range(n):
            v = jfn(x)
        float(v)
        return (time.time() - t0) / n * 1e3

    ms_q1 = t(lambda x: jnp.sum(qscan(x, plan, median_stride=8, time_decimation=1)), flat)
    ms_q4 = t(lambda x: jnp.sum(qscan(x, plan, median_stride=8, time_decimation=4)), flat)
    print(f"qscan d=1 ({B*D} scans): {ms_q1:.1f} ms | d=4: {ms_q4:.1f} ms", flush=True)

    ms_qa = t(lambda x: jnp.sum(qadapter_apply(qcfg, task.trainable["qadapter"], x)
                                .astype(jnp.float32)), strain)
    print(f"qadapter full (scan+CNN+pool to (80,{target_frames})): {ms_qa:.1f} ms", flush=True)

    mel = jnp.asarray(rng.normal(size=(B * D, 80, target_frames)), dtype)
    enc_p = task.frozen["encoder"]
    ad = task.trainable["adapters"]
    ms_enc = t(lambda x: jnp.sum(encoder_apply(enc_cfg, enc_p, x, ad).astype(jnp.float32)),
               mel, n=4)
    print(f"encoder fwd (B={B*D}, T={target_frames//2}): {ms_enc:.1f} ms", flush=True)

    ms_full = t(lambda x: jnp.sum(task.forward(task.trainable, task.frozen, x)
                                  .astype(jnp.float32)), strain, n=4)
    win_s = B * 0.1  # 0.1 s stride, dual-detector counted once
    print(f"full score step: {ms_full:.1f} ms -> device-only {win_s / (ms_full/1e3):.1f}x realtime")


if __name__ == "__main__":
    main()
