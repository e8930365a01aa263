"""Per-component timing of the MLGWSC search step on the current backend.

Times: Q-scan alone, Q-adapter (scan+CNN+pool), single encoder forward,
full score step. Run on TPU (default) to find the bottleneck.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    out = out[0] if isinstance(out, tuple) else out
    out.block_until_ready()
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from gwkit.models.qadapter import qadapter_apply
    from gwkit.models.whisper import config_for, encoder_apply
    from gwkit.ops.qtransform import make_qplan, qscan
    from gwkit.train.tasks import build_mlgwsc

    B = int(os.environ.get("PROF_BATCH", "32"))
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    print(f"platform={platform} B={B}")

    enc = config_for("tiny", compute_dtype=dtype)
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc)
    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.normal(size=(B, 2, 2048)).astype(np.float32))

    plan = make_qplan(1.0, 2048.0, (4.0, 128.0), (128, 128))
    q_fn = jax.jit(lambda x: qscan(x.reshape(-1, 2048), plan))
    t = timeit(q_fn, windows)
    print(f"qscan (2B={2*B} scans): {t*1e3:.1f} ms")

    qa_fn = jax.jit(lambda x: qadapter_apply(task.qcfg, task.trainable["qadapter"], x))
    t = timeit(qa_fn, windows)
    print(f"qadapter total: {t*1e3:.1f} ms")
    feats = qa_fn(windows)

    enc_fn = jax.jit(lambda m: encoder_apply(enc, task.frozen["encoder"], m, task.trainable["adapters"]))
    t = timeit(enc_fn, feats[:, 0])
    print(f"encoder fwd (B={B}, 1500 tok): {t*1e3:.1f} ms")

    full_fn = jax.jit(lambda w: task.forward(task.trainable, task.frozen, w)[:, 0])
    t = timeit(full_fn, windows)
    print(f"full score step: {t*1e3:.1f} ms -> {B*0.1/t:.1f}x realtime at stride 0.1s")


if __name__ == "__main__":
    main()
