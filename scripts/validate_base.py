"""Whisper-base fused-path validation ON THE REAL CHIP (VERDICT r3 #6).

The base geometry (d_model 512, 8 heads, 6 layers) at T=1500 exceeds the
whole-layer kernel's VMEM budget and takes the split path — attention-block
kernel + token-tiled fused MLP (gwkit/ops/fused_block.py). Round 3 only
exercised that path in CPU interpret mode; this script runs it COMPILED:

1. Forward parity: fused vs unfused encoder outputs at base/T=1500, same
   weights + DoRA adapters, bf16.
2. Gradient parity: one RegBCE-style loss gradient through both paths,
   per-leaf max relative error.
3. Timing: fused vs flash-unfused forward (fetch-forced).

Env: VB_BATCH (8), VB_FRAMES (3000 -> T=1500), VB_SIZE (base).
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

    B = int(os.environ.get("VB_BATCH", "8"))
    frames = int(os.environ.get("VB_FRAMES", "3000"))
    size = os.environ.get("VB_SIZE", "base")
    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"platform={platform} size={size} B={B} frames={frames} dtype={dtype.__name__}")

    kw = dict(compute_dtype=dtype, gelu_approx=True, max_positions=frames // 2)
    cfg_fused = config_for(size, fused_block=True, **kw)
    cfg_flash = config_for(size, use_flash_attention=True, **kw)
    cfg_plain = config_for(size, **kw)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_plain)
    acfg = AdapterConfig(r=8, alpha=32, use_dora=True, targets="qkvo")
    adapters = init_adapters(jax.random.PRNGKey(1), cfg_plain, acfg, params)
    # perturb away from the exact-identity DoRA init (B=0) so the adapters
    # contribute to the forward AND receive nonzero gradients
    leaves, treedef = jax.tree_util.tree_flatten(adapters)
    noise = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    adapters = jax.tree_util.tree_unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, noise)])
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 80, frames)).astype(np.float32))

    def fwd(cfg):
        return jax.jit(lambda m, p, a: encoder_apply(cfg, p, m, adapters=a))

    outs = {}
    times = {}
    for name, cfg in (("fused", cfg_fused), ("flash", cfg_flash), ("plain", cfg_plain)):
        f = fwd(cfg)
        y = f(mel, params, adapters)
        float(jnp.sum(y.astype(jnp.float32)))  # fetch-forced warmup
        t0 = time.time()
        for _ in range(3):
            y = f(mel, params, adapters)
        float(jnp.sum(y.astype(jnp.float32)))
        times[name] = (time.time() - t0) / 3
        outs[name] = np.asarray(y.astype(jnp.float32))
        print(f"{name:6s}: {times[name]*1e3:8.1f} ms/fwd "
              f"({times[name]/B*1e3:.2f} ms/seq)")

    ref = outs["plain"]
    scale = np.abs(ref).mean()
    for name in ("fused", "flash"):
        d = np.abs(outs[name] - ref)
        print(f"{name} vs plain: max|delta| {d.max():.4f}, mean {d.mean():.5f} "
              f"(ref mean|y| {scale:.3f})")
        assert d.max() < 0.15 * max(scale, 1.0), f"{name} forward diverges"

    # gradient parity through the custom_vjp (fused) vs plain autodiff
    tgt = jnp.asarray(np.random.default_rng(2).normal(size=ref.shape[-1:]).astype(np.float32))

    def loss_of(cfg):
        def loss(a):
            y = encoder_apply(cfg, params, mel, adapters=a)
            s = jnp.mean(y.astype(jnp.float32) @ tgt)
            return s
        return jax.jit(jax.grad(loss))

    g_fused = loss_of(cfg_fused)(adapters)
    g_plain = loss_of(cfg_plain)(adapters)
    worst = 0.0
    for (kp, gf), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_fused),
            jax.tree_util.tree_leaves_with_path(g_plain)):
        gf = np.asarray(gf, np.float32)
        gp = np.asarray(gp, np.float32)
        denom = max(np.abs(gp).max(), 1e-6)
        rel = np.abs(gf - gp).max() / denom
        worst = max(worst, rel)
    print(f"gradient parity fused vs plain: worst per-leaf max rel err {worst:.4f}")
    assert worst < 0.1, "fused backward diverges at base dims"
    print("VALIDATE BASE OK")


if __name__ == "__main__":
    main()
