"""Golden tests: fused DoRA vs peft's use_dora=True implementation.

Reference applies peft DoRA to Whisper attention projections
(MLGWSC-1/train.py:666-702; shipped adapter_config: r=8, alpha=32,
use_dora=true). Here DoRA is a fused functional op (gwkit.ops.dora).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gwkit.ops.dora import dora_linear, dora_row_norms  # noqa: E402

D_IN, D_OUT, R, ALPHA = 48, 32, 8, 32


@pytest.fixture(scope="module")
def peft_layer():
    torch.manual_seed(0)
    base = torch.nn.Linear(D_IN, D_OUT)
    model = torch.nn.Sequential()
    model.add_module("proj", base)
    cfg = peft.LoraConfig(r=R, lora_alpha=ALPHA, use_dora=True, target_modules=["proj"], lora_dropout=0.0)
    pm = peft.get_peft_model(model, cfg)
    layer = pm.base_model.model.proj
    # Perturb A/B/magnitude so the test is not trivially base-only (B=0 at init).
    with torch.no_grad():
        layer.lora_A["default"].weight.normal_(std=0.1)
        layer.lora_B["default"].weight.normal_(std=0.1)
        layer.lora_magnitude_vector["default"].weight.normal_(mean=1.0, std=0.05)
    return layer


def _adapter_from_peft(layer):
    a = layer.lora_A["default"].weight.detach().numpy().T  # (d_in, r)
    b = layer.lora_B["default"].weight.detach().numpy().T  # (r, d_out)
    m = layer.lora_magnitude_vector["default"].weight.detach().numpy().reshape(-1)
    return {
        "a": jnp.asarray(a),
        "b": jnp.asarray(b),
        "m": jnp.asarray(m),
        "scaling": jnp.float32(ALPHA / R),
    }


def test_dora_forward_matches_peft(peft_layer):
    layer = peft_layer
    x = np.random.default_rng(0).normal(size=(5, D_IN)).astype(np.float32)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x)).numpy()
    w0 = jnp.asarray(layer.base_layer.weight.detach().numpy().T)
    bias = jnp.asarray(layer.base_layer.bias.detach().numpy())
    ours = np.asarray(dora_linear(jnp.asarray(x), w0, bias, _adapter_from_peft(layer)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_row_norms_match_materialized(peft_layer):
    layer = peft_layer
    ad = _adapter_from_peft(layer)
    w0 = jnp.asarray(layer.base_layer.weight.detach().numpy().T)
    fused = np.asarray(dora_row_norms(w0, ad["a"], ad["b"], float(ad["scaling"])))
    w_eff = np.asarray(w0) + float(ad["scaling"]) * (np.asarray(ad["a"]) @ np.asarray(ad["b"]))
    direct = np.linalg.norm(w_eff, axis=0)
    np.testing.assert_allclose(fused, direct, rtol=1e-5, atol=1e-6)


def test_dora_gradients_match_peft(peft_layer):
    """Gradients wrt A, B, magnitude must match peft (norm detached)."""
    layer = peft_layer
    x_np = np.random.default_rng(1).normal(size=(4, D_IN)).astype(np.float32)

    # peft grads
    x = torch.from_numpy(x_np)
    out = layer(x)
    loss = (out ** 2).sum()
    for p in [layer.lora_A["default"].weight, layer.lora_B["default"].weight,
              layer.lora_magnitude_vector["default"].weight]:
        if p.grad is not None:
            p.grad = None
    loss.backward()
    ga_ref = layer.lora_A["default"].weight.grad.numpy().T
    gb_ref = layer.lora_B["default"].weight.grad.numpy().T
    gm_ref = layer.lora_magnitude_vector["default"].weight.grad.numpy().reshape(-1)

    w0 = jnp.asarray(layer.base_layer.weight.detach().numpy().T)
    bias = jnp.asarray(layer.base_layer.bias.detach().numpy())
    ad = _adapter_from_peft(layer)

    def loss_fn(trainable):
        full = dict(ad, **trainable)
        y = dora_linear(jnp.asarray(x_np), w0, bias, full)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn)({"a": ad["a"], "b": ad["b"], "m": ad["m"]})
    np.testing.assert_allclose(np.asarray(grads["a"]), ga_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["b"]), gb_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["m"]), gm_ref, rtol=1e-4, atol=1e-4)


def test_encoder_with_adapters_identity_at_init():
    """DoRA at init (B=0, m=||W0||) must reproduce the base encoder exactly."""
    from gwkit.models.adapters import AdapterConfig, init_adapters
    from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=16)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    adapters = init_adapters(jax.random.PRNGKey(1), cfg, AdapterConfig(targets="qkvo"), params)
    mel = jnp.asarray(np.random.default_rng(2).normal(size=(1, 80, 32)).astype(np.float32))
    base = encoder_apply(cfg, params, mel)
    with_ad = encoder_apply(cfg, params, mel, adapters=adapters)
    np.testing.assert_allclose(np.asarray(with_ad), np.asarray(base), rtol=1e-5, atol=1e-5)


def test_peft_export_import_round_trip(tmp_path):
    from gwkit.models.adapters import AdapterConfig, export_peft_dir, import_peft_dir, init_adapters
    from gwkit.models.whisper import WhisperConfig, init_encoder_params

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=16)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    acfg = AdapterConfig(r=4, alpha=16, use_dora=True, targets="kv")
    adapters = init_adapters(jax.random.PRNGKey(1), cfg, acfg, params)
    adapters = jax.tree.map(lambda x: x + 0.01, adapters)  # make B nonzero

    path = str(tmp_path / "lora_weights")
    export_peft_dir(path, adapters, acfg, n_layers=cfg.n_layers)
    loaded, loaded_cfg = import_peft_dir(path, n_layers=cfg.n_layers)
    assert loaded_cfg.r == acfg.r and loaded_cfg.alpha == acfg.alpha and loaded_cfg.use_dora
    assert set(loaded.keys()) == {"k", "v"}
    for proj in ("k", "v"):
        for part in ("a", "b", "m"):
            np.testing.assert_allclose(
                np.asarray(loaded[proj][part]), np.asarray(adapters[proj][part]), rtol=1e-6, atol=1e-7
            )
