"""Fused LN+MLP+residual kernel vs unfused math (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.ops.fused_mlp import _unfused, fused_mlp_block


@pytest.fixture
def inputs(rng):
    B, T, D, F = 2, 70, 32, 128
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=D).astype(np.float32) * 0.1 + 1.0)
    b = jnp.asarray(rng.normal(size=D).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(D, F)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=F).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=D).astype(np.float32) * 0.1)
    return x, g, b, w1, b1, w2, b2


def test_fused_mlp_matches_unfused(inputs):
    ref = np.asarray(_unfused(*inputs))
    out = np.asarray(fused_mlp_block(*inputs, block_t=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_fused_mlp_gradients(inputs):
    g_ref = jax.grad(lambda *a: (_unfused(*a) ** 2).sum(), argnums=tuple(range(7)))(*inputs)
    g_out = jax.grad(
        lambda *a: (fused_mlp_block(*a, block_t=64, interpret=True) ** 2).sum(),
        argnums=tuple(range(7)),
    )(*inputs)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_encoder_fused_mlp_flag(rng):
    import dataclasses

    from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params
    from gwkit.ops import fused_mlp as FM

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=64)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(1, 80, 128)).astype(np.float32))
    base = encoder_apply(cfg, params, mel)

    real = FM.fused_mlp_block
    FM.fused_mlp_block = lambda *a, **k: real(*a, **{**k, "interpret": True})
    try:
        out = encoder_apply(dataclasses.replace(cfg, fused_mlp=True), params, mel)
    finally:
        FM.fused_mlp_block = real
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4)
