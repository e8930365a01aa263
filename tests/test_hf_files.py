"""HF checkpoint file-path loading (safetensors / torch .pt)."""
import numpy as np
import pytest

import jax


def test_load_encoder_from_safetensors_file(tmp_path, rng):
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from gwkit.models.hf_io import encoder_state_dict_from_params, load_hf_encoder
    from gwkit.models.whisper import WhisperConfig, init_encoder_params

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=32)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    state = encoder_state_dict_from_params(params, cfg)
    path = str(tmp_path / "model.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)

    cfg2, params2 = load_hf_encoder(path, size="tiny", d_model=64, n_heads=2,
                                    n_layers=2, d_ff=128, max_positions=32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_encoder_from_torch_file(tmp_path, rng):
    torch = pytest.importorskip("torch")

    from gwkit.models.hf_io import encoder_state_dict_from_params, load_hf_encoder
    from gwkit.models.whisper import WhisperConfig, init_encoder_params

    cfg = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=32)
    params = init_encoder_params(jax.random.PRNGKey(1), cfg)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in encoder_state_dict_from_params(params, cfg).items()}
    path = str(tmp_path / "encoder.pt")
    torch.save(state, path)
    _, params2 = load_hf_encoder(path, size="tiny", d_model=64, n_heads=2,
                                 n_layers=2, d_ff=128, max_positions=32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
