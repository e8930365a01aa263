"""Fused whole-layer encoder kernel vs the unfused reference math
(interpreter mode on CPU), values and gradients, with and without DoRA."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.models.adapters import AdapterConfig, init_adapters
from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params
from gwkit.ops.fused_block import _reference_block, fused_encoder_block

CFG = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=64)


def _layer_slice(tree, i):
    return jax.tree.map(lambda a: a[i], tree)


@pytest.fixture(scope="module")
def setup():
    params = init_encoder_params(jax.random.PRNGKey(0), CFG)
    adapters = init_adapters(jax.random.PRNGKey(1), CFG,
                             AdapterConfig(r=4, alpha=8, use_dora=True, targets="qkvo"),
                             params)
    # non-zero B so the low-rank path actually contributes
    adapters = jax.tree.map(
        lambda a: a + 0.01 * np.arange(a.size, dtype=np.float32).reshape(a.shape) % 0.07,
        adapters)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(3, 50, 64)).astype(np.float32))
    return params, adapters, x


@pytest.mark.parametrize("with_adapters", [False, True])
@pytest.mark.parametrize("approx", [False, True])
def test_fused_block_matches_reference(setup, with_adapters, approx):
    params, adapters, x = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0) if with_adapters else None
    want = _reference_block(x, p, ad, CFG.n_heads, approx)
    got = fused_encoder_block(x, p, CFG.n_heads, ad, approx=approx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_fused_block_matches_whisper_block(setup):
    """The in-kernel math must agree with gwkit.models.whisper._block (the
    production unfused path) — guards both reimplementations at once."""
    params, adapters, x = setup
    from gwkit.models.whisper import _block

    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0)
    want = _block(x, p, CFG, ad)
    got = fused_encoder_block(x, p, CFG.n_heads, ad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_fused_block_gradients(setup):
    """custom_vjp backward (reference-math recompute) == direct grads of the
    reference math, for x, params, and adapters."""
    params, adapters, x = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0)

    def loss_fused(xx, pp, aa):
        return jnp.sum(fused_encoder_block(xx, pp, CFG.n_heads, aa, interpret=True) ** 2)

    def loss_ref(xx, pp, aa):
        return jnp.sum(_reference_block(xx, pp, aa, CFG.n_heads, False) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, p, ad)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p, ad)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T", [50, 300, 600, 130])
def test_fused_block_non_divisible_lengths(setup, T):
    """Tail-row coverage: lengths whose 128-padded tp (384, 640, 256) is NOT
    a multiple of the default 512/256 tiles previously skipped the tail rows
    entirely (ADVICE r2 high finding) — every row must match the reference."""
    params, adapters, _ = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0)
    x = jnp.asarray(np.random.default_rng(T).normal(size=(2, T, 64)).astype(np.float32))
    want = _reference_block(x, p, ad, CFG.n_heads, False)
    got = fused_encoder_block(x, p, CFG.n_heads, ad, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("scale", [1e-3, 1.0, 60.0, 1e3])
def test_fused_block_adversarial_score_scales(setup, scale):
    """Softmax robustness across attention-logit scales (VERDICT r2 weak #3):
    scaling the q projection weight by up to 1e3 drives raw scores far past
    the old constant-shift clamp (+80) and far below its bf16 underflow point
    (~-67). The per-row max shift must reproduce the reference softmax —
    finite and equal — at every scale."""
    params, _, x = setup
    p = dict(_layer_slice(params["layers"], 0))
    p["q"] = dict(p["q"], w=p["q"]["w"] * scale, b=p["q"]["b"] * scale)
    want = _reference_block(x, p, None, CFG.n_heads, False)
    got = fused_encoder_block(x, p, CFG.n_heads, None, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-6 * max(scale, 1.0))


def test_encoder_fused_flag_matches_unfused(setup):
    """encoder_apply(fused_block=True) == encoder_apply(unfused) end to end
    (scan over stacked layers, conv stem, positions, final LN)."""
    params, adapters, _ = setup
    mel = jnp.asarray(np.random.default_rng(5).normal(size=(2, 80, 128)).astype(np.float32))
    cfg_fused = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128,
                              max_positions=64, fused_block=True)
    want = encoder_apply(CFG, params, mel, adapters)
    got = encoder_apply(cfg_fused, params, mel, adapters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("with_adapters", [False, True])
def test_fused_block_quant_matches_quant_reference(setup, with_adapters):
    """int8 projection path: the kernel must match the jnp quantized
    reference (same _quantize_cols/_qdot math) at fp tolerance — the
    quantization itself is deterministic and shared, so the only differences
    are attention-core reduction orders."""
    params, adapters, x = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0) if with_adapters else None
    want = _reference_block(x, p, ad, CFG.n_heads, False, quant=True)
    got = fused_encoder_block(x, p, CFG.n_heads, ad, interpret=True, quant=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_fused_block_quant_error_bound(setup):
    """int8 vs full precision: per-column weight + per-row activation
    symmetric quantization must stay within a few percent relative L2 of the
    full-precision block output (the AUC-parity gate for the search path is
    separate; this guards against gross scale bugs)."""
    params, adapters, x = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0)
    full = np.asarray(_reference_block(x, p, ad, CFG.n_heads, False))
    q = np.asarray(fused_encoder_block(x, p, CFG.n_heads, ad, interpret=True,
                                       quant=True))
    rel = np.linalg.norm(q - full) / np.linalg.norm(full)
    assert np.isfinite(q).all()
    assert rel < 0.03, f"int8 relative L2 error {rel:.4f}"


def test_fused_block_quant_nondivisible_length(setup):
    """Quant path through the tail-masked softmax geometry (T=130 -> tp=256)."""
    params, adapters, _ = setup
    p = _layer_slice(params["layers"], 0)
    ad = _layer_slice(adapters, 0)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 130, 64)).astype(np.float32))
    want = _reference_block(x, p, ad, CFG.n_heads, False, quant=True)
    got = fused_encoder_block(x, p, CFG.n_heads, ad, interpret=True, quant=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_encoder_quant_int8_close_to_unfused(setup):
    """encoder_apply with quant_int8: end-to-end (conv stem, positions, scan
    over layers, final LN) the int8 path must stay close to the full-precision
    unfused encoder — layer-to-layer error compounding is bounded."""
    params, adapters, _ = setup
    mel = jnp.asarray(np.random.default_rng(9).normal(size=(2, 80, 128)).astype(np.float32))
    cfg_q = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128,
                          max_positions=64, fused_block=True, quant_int8=True)
    want = np.asarray(encoder_apply(CFG, params, mel, adapters))
    got = np.asarray(encoder_apply(cfg_q, params, mel, adapters))
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, f"int8 encoder relative L2 {rel:.4f}"


def test_f32_oversize_geometry_falls_back_to_reference_math(monkeypatch):
    """Geometries whose ATTENTION-ONLY kernel exceeds the 16MB scoped VMEM
    (f32 at T=1536: 7 (tp,D) f32 buffers = 16.5MB; v5e measured the OOM)
    must route to the reference-math path instead of failing to compile —
    and the routing must produce the same values."""
    import gwkit.ops.fused_block as fb

    cfg_T, D, H = 1536, 384, 6
    rng = np.random.default_rng(0)

    def mat(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.02)
    p = {
        "attn_ln": {"g": jnp.ones(D), "b": jnp.zeros(D)},
        "mlp_ln": {"g": jnp.ones(D), "b": jnp.zeros(D)},
        "q": {"w": mat(D, D), "b": jnp.zeros(D)},
        "k": {"w": mat(D, D)},
        "v": {"w": mat(D, D), "b": jnp.zeros(D)},
        "o": {"w": mat(D, D), "b": jnp.zeros(D)},
        "fc1": {"w": mat(D, 4 * D), "b": jnp.zeros(4 * D)},
        "fc2": {"w": mat(4 * D, D), "b": jnp.zeros(D)},
    }
    x = jnp.asarray(rng.normal(size=(1, cfg_T, D)).astype(np.float32))

    routed = {"reference": False}
    orig = fb._reference_block

    def spy(*a, **k):
        routed["reference"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fb, "_reference_block", spy)
    out = fb.fused_encoder_block(x, p, H, None, interpret=True)
    assert routed["reference"], "f32 T=1536 must take the VMEM fallback"
    want = orig(x, p, None, H, approx=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5, atol=2e-5)

    # bf16-sized buffers at the same geometry stay on the kernel path
    routed["reference"] = False
    xs = jnp.asarray(rng.normal(size=(1, 256, D)).astype(np.float32))
    fb.fused_encoder_block(xs, p, H, None, interpret=True)
    assert not routed["reference"], "small geometries must keep the kernel path"
