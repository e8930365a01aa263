"""Encoder-forward micro-benchmark on the current backend: unfused vs
fused_block vs flash-only, with DoRA adapters, at a chosen (B, frames).

Fetch-forced timing (docs/PERF.md): block_until_ready returns early on this
PJRT backend — reduce to a scalar and float() it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gwkit.models.adapters import AdapterConfig, init_adapters
    from gwkit.models.whisper import config_for, encoder_apply, init_encoder_params

    B = int(os.environ.get("ENC_BATCH", "64"))
    frames = int(os.environ.get("ENC_FRAMES", "3000"))
    size = os.environ.get("ENC_SIZE", "tiny")
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    print(f"platform={platform} B={B} frames={frames} size={size}")

    variants = {
        "unfused": dict(),
        "flash": dict(use_flash_attention=True),
        "fused_block": dict(fused_block=True),
    }
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(B, 80, frames)).astype(np.float32))
    base_cfg = config_for(size, compute_dtype=dtype, gelu_approx=True,
                          max_positions=frames // 2)
    params = init_encoder_params(jax.random.PRNGKey(0), base_cfg)
    adapters = init_adapters(jax.random.PRNGKey(1), base_cfg,
                             AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo"),
                             params)

    T = frames // 2
    d, f, L, H = base_cfg.d_model, base_cfg.d_ff, base_cfg.n_layers, base_cfg.n_heads
    hd = d // H
    flops = L * B * (4 * 2 * T * d * d + 2 * 2 * H * T * T * hd + 2 * 2 * T * d * f)

    ref = None
    for name, over in variants.items():
        cfg = config_for(size, compute_dtype=dtype, gelu_approx=True,
                         max_positions=frames // 2, **over)
        fn = jax.jit(lambda m, c=cfg: encoder_apply(c, params, m, adapters))
        try:
            out = float(jnp.sum(fn(mel).astype(jnp.float32)))  # compile + fetch
            t0 = time.time()
            n = 5
            for _ in range(n):
                s = jnp.sum(fn(mel).astype(jnp.float32))
            float(s)
            dt = (time.time() - t0) / n
            tf = flops / dt / 1e12
            print(f"{name:12s}: {dt*1e3:7.1f} ms  {tf:6.1f} TFLOP/s  (sum {out:.3e})")
            if ref is None:
                ref = out
            else:
                rel = abs(out - ref) / (abs(ref) + 1e-30)
                print(f"{'':12s}  rel-diff vs unfused: {rel:.2e}")
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
