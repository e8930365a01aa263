"""Sweep fused-block kernel tile sizes on one layer (TPU tuning harness)."""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gwkit.models.adapters import AdapterConfig, init_adapters
    from gwkit.models.whisper import config_for, init_encoder_params
    from gwkit.ops.fused_block import fused_encoder_block

    B = int(os.environ.get("SWEEP_BATCH", "64"))
    T = int(os.environ.get("SWEEP_T", "1500"))
    cfg = config_for("tiny", max_positions=T)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    adapters = init_adapters(jax.random.PRNGKey(1), cfg,
                             AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                             params)
    p = jax.tree.map(lambda a: a[0].astype(dtype) if a.ndim and a.shape[0] == cfg.n_layers else a,
                     params["layers"])
    ad = jax.tree.map(lambda a: a[0], adapters)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, cfg.d_model)), dtype)

    d, f, H = cfg.d_model, cfg.d_ff, cfg.n_heads
    hd = d // H
    flops = B * (4 * 2 * T * d * d + 2 * 2 * H * T * T * hd + 2 * 2 * T * d * f)
    for bq, bf in itertools.product((256,), (256,)):
        fn = jax.jit(lambda xx: fused_encoder_block(
            xx, p, H, ad, approx=True, block_q=bq, block_f=bf))
        try:
            float(jnp.sum(fn(x).astype(jnp.float32)))
            t0 = time.time()
            for _ in range(10):
                s = jnp.sum(fn(x).astype(jnp.float32))
            float(s)
            dt = (time.time() - t0) / 10
            print(f"block_q={bq} block_f={bf}: {dt*1e3:6.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"block_q={bq} block_f={bf}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
