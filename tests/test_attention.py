"""Fused-attention kernel vs the reference jnp path (Pallas interpret mode
on the CPU backend; the compiled kernel runs on TPU in bench/serving)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.ops.attention import flash_attention, reference_attention


@pytest.mark.parametrize("t", [128, 300])  # 300 exercises the pad+mask path
def test_flash_attention_matches_reference(rng, t):
    B, H, hd = 2, 2, 32
    q = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32)) * hd ** -0.5
    k = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32))
    ref = np.asarray(reference_attention(q, k, v))
    ours = np.asarray(flash_attention(q, k, v, block_q=128, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_gradients(rng):
    """custom_vjp: gradients through the kernel equal the reference path's."""
    B, t, H, hd = 2, 70, 2, 16
    q = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32)) * hd ** -0.5
    k = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, t, H, hd)).astype(np.float32))
    g1 = jax.grad(lambda *a: flash_attention(*a, block_q=64, interpret=True).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: reference_attention(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_encoder_flash_flag_matches(rng):
    """Encoder with use_flash_attention (interpret on CPU) == without.

    T must sit at/above the length-adaptive dispatch threshold (1024) or the
    encoder takes the XLA path regardless of the flag and the test is vacuous;
    a call counter asserts the kernel really ran.
    """
    import dataclasses

    from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=1024)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(1, 80, 2048)).astype(np.float32))
    base = encoder_apply(cfg, params, mel)

    # monkeypatch flash to interpret mode for the CPU test backend
    from gwkit.ops import attention as A

    real_flash = A.flash_attention
    calls = []

    def flash_interp(q, k, v):
        calls.append(q.shape)
        return real_flash(q, k, v, interpret=True)

    A.flash_attention = flash_interp
    try:
        flash_cfg = dataclasses.replace(cfg, use_flash_attention=True)
        out = encoder_apply(flash_cfg, params, mel)
    finally:
        A.flash_attention = real_flash
    assert calls, "flash kernel was never dispatched (length gate regressed?)"
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4)


def test_encoder_short_context_uses_xla_path(rng):
    """Below the 1024-token threshold the flag must NOT dispatch the kernel."""
    import dataclasses

    from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params
    from gwkit.ops import attention as A

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=64)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(rng.normal(size=(1, 80, 128)).astype(np.float32))
    real_flash = A.flash_attention
    calls = []
    A.flash_attention = lambda q, k, v: (calls.append(1), real_flash(q, k, v, interpret=True))[1]
    try:
        out = encoder_apply(dataclasses.replace(cfg, use_flash_attention=True), params, mel)
    finally:
        A.flash_attention = real_flash
    assert not calls
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(encoder_apply(cfg, params, mel)), rtol=1e-5, atol=1e-5
    )
