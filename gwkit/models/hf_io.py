"""HF Whisper checkpoint interop.

Loads ``openai/whisper-*`` encoder weights (from a transformers model object,
a torch state dict, or a safetensors file) into gwkit's stacked-param pytree,
and exports back. This replaces the reference's direct dependency on
``WhisperModel.from_pretrained`` (MLGWSC-1/train.py:658-663).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from gwkit.models.whisper import WhisperConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def encoder_params_from_state_dict(state: Mapping[str, Any], cfg: WhisperConfig) -> Dict:
    """Convert an HF WhisperEncoder state dict to gwkit params.

    Accepts keys with or without an ``encoder.``/``model.encoder.`` prefix.
    Layout conversions: torch Linear (out, in) -> (in, out);
    torch Conv1d (out, in, k) -> (k, in, out).
    """
    sd = {}
    for k, v in state.items():
        k = k.removeprefix("model.").removeprefix("encoder.")
        sd[k] = _np(v)

    def lin(name, bias=True):
        p = {"w": sd[f"{name}.weight"].T.copy()}
        if bias:
            p["b"] = sd[f"{name}.bias"].copy()
        return p

    def ln(name):
        return {"g": sd[f"{name}.weight"].copy(), "b": sd[f"{name}.bias"].copy()}

    layers = []
    for i in range(cfg.n_layers):
        pre = f"layers.{i}"
        layers.append(
            {
                "attn_ln": ln(f"{pre}.self_attn_layer_norm"),
                "q": lin(f"{pre}.self_attn.q_proj"),
                "k": lin(f"{pre}.self_attn.k_proj", bias=False),
                "v": lin(f"{pre}.self_attn.v_proj"),
                "o": lin(f"{pre}.self_attn.out_proj"),
                "mlp_ln": ln(f"{pre}.final_layer_norm"),
                "fc1": lin(f"{pre}.fc1"),
                "fc2": lin(f"{pre}.fc2"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)
    return {
        "conv1": {"w": jnp.asarray(sd["conv1.weight"].transpose(2, 1, 0)), "b": jnp.asarray(sd["conv1.bias"])},
        "conv2": {"w": jnp.asarray(sd["conv2.weight"].transpose(2, 1, 0)), "b": jnp.asarray(sd["conv2.bias"])},
        "pos": jnp.asarray(sd["embed_positions.weight"][: cfg.max_positions]),
        "layers": stacked,
        "ln_post": ln("layer_norm"),
    }


def load_hf_encoder(path_or_model, size: str = "tiny", **cfg_overrides):
    """Load from a transformers WhisperModel/WhisperEncoder instance, a
    state-dict mapping, or a safetensors/torch-checkpoint file path.

    Returns (cfg, params).
    """
    from gwkit.models.whisper import config_for

    cfg = config_for(size, **cfg_overrides)
    if hasattr(path_or_model, "state_dict"):
        state = path_or_model.state_dict()
    elif isinstance(path_or_model, Mapping):
        state = path_or_model
    elif isinstance(path_or_model, str) and path_or_model.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path_or_model)
    else:
        import torch

        state = torch.load(path_or_model, map_location="cpu")
    return cfg, encoder_params_from_state_dict(state, cfg)


def encoder_state_dict_from_params(params: Dict, cfg: WhisperConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion, for exporting gwkit weights to HF consumers."""
    out = {
        "conv1.weight": _np(params["conv1"]["w"]).transpose(2, 1, 0),
        "conv1.bias": _np(params["conv1"]["b"]),
        "conv2.weight": _np(params["conv2"]["w"]).transpose(2, 1, 0),
        "conv2.bias": _np(params["conv2"]["b"]),
        "embed_positions.weight": _np(params["pos"]),
        "layer_norm.weight": _np(params["ln_post"]["g"]),
        "layer_norm.bias": _np(params["ln_post"]["b"]),
    }
    L = cfg.n_layers
    lay = params["layers"]
    names = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
        "o": "self_attn.out_proj", "fc1": "fc1", "fc2": "fc2",
    }
    for i in range(L):
        pre = f"layers.{i}"
        for ours, theirs in names.items():
            out[f"{pre}.{theirs}.weight"] = _np(lay[ours]["w"][i]).T
            if "b" in lay[ours]:
                out[f"{pre}.{theirs}.bias"] = _np(lay[ours]["b"][i])
        out[f"{pre}.self_attn_layer_norm.weight"] = _np(lay["attn_ln"]["g"][i])
        out[f"{pre}.self_attn_layer_norm.bias"] = _np(lay["attn_ln"]["b"][i])
        out[f"{pre}.final_layer_norm.weight"] = _np(lay["mlp_ln"]["g"][i])
        out[f"{pre}.final_layer_norm.bias"] = _np(lay["mlp_ln"]["b"][i])
    return out
