"""Golden tests: gwkit Whisper encoder vs HF transformers (torch, CPU).

The HF model is *locally random-initialized from config* (no hub download),
weights are converted via gwkit.models.hf_io, and outputs compared. This
validates architecture + conversion parity exactly as loading the real
pretrained checkpoint would (reference backbone: MLGWSC-1/train.py:658-663).

Uses a shrunken config (2 layers, d=64) to keep single-CPU CI fast; the
conversion code paths are size-independent.
"""
import numpy as np
import pytest

from gwkit.models.whisper import WhisperConfig, encoder_apply, init_encoder_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def tiny_hf_model(n_mels=80, d_model=64, heads=2, layers=2, ff=128, max_pos=32):
    from transformers import WhisperConfig as HFConfig, WhisperModel

    hf_cfg = HFConfig(
        num_mel_bins=n_mels,
        d_model=d_model,
        encoder_attention_heads=heads,
        encoder_layers=layers,
        encoder_ffn_dim=ff,
        decoder_layers=1,
        decoder_attention_heads=heads,
        decoder_ffn_dim=ff,
        max_source_positions=max_pos,
    )
    torch.manual_seed(0)
    model = WhisperModel(hf_cfg).eval()
    return model.encoder


@pytest.fixture(scope="module")
def pair():
    from gwkit.models.hf_io import load_hf_encoder

    enc = tiny_hf_model()
    cfg, params = load_hf_encoder(
        enc, size="tiny", d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=32
    )
    return enc, cfg, params


def test_encoder_matches_hf(pair):
    enc, cfg, params = pair
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 80, 64)).astype(np.float32)  # 64 frames -> 32 positions
    with torch.no_grad():
        ref = enc(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encoder_apply(cfg, params, jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_state_dict_round_trip(pair):
    from gwkit.models.hf_io import encoder_params_from_state_dict, encoder_state_dict_from_params

    enc, cfg, params = pair
    state = encoder_state_dict_from_params(params, cfg)
    params2 = encoder_params_from_state_dict(state, cfg)
    for (p1, _), (p2, _) in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree_util.tree_leaves_with_path(params2)
    ):
        pass
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    for l1, l2 in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_remat_matches(pair):
    import dataclasses

    enc, cfg, params = pair
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(size=(1, 80, 64)).astype(np.float32))
    base = encoder_apply(cfg, params, mel)
    remat = encoder_apply(dataclasses.replace(cfg, remat=True), params, mel)
    np.testing.assert_allclose(np.asarray(base), np.asarray(remat), rtol=1e-6, atol=1e-6)


def test_random_init_runs():
    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=32)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 80, 64), jnp.float32)
    out = encoder_apply(cfg, params, mel)
    assert out.shape == (1, 32, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_stem_matmul_matches_lax_conv(rng):
    """The tap-concatenated matmul lowering == lax.conv for k=3, strides 1/2,
    including the odd-length fallback path."""
    import jax
    import jax.numpy as jnp

    from gwkit.models.whisper import _conv1d

    for T, stride in [(30, 1), (30, 2), (31, 1), (31, 2)]:
        x = jnp.asarray(rng.normal(size=(2, T, 5)).astype(np.float32))
        p = {"w": jnp.asarray(rng.normal(size=(3, 5, 7)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32))}
        ref = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,), padding=((1, 1),),
            dimension_numbers=("NHC", "HIO", "NHC")) + p["b"]
        got = _conv1d(x, p, stride)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
