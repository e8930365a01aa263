"""DoRA/LoRA adapter pytrees for the Whisper encoder + peft-compatible IO.

Replaces the reference's runtime module-wrapping dance
(``get_peft_model(LoraConfig(...))`` + requires_grad filtering,
MLGWSC-1/train.py:666-702) with a first-class *separate pytree*: base params
stay frozen by construction, the optimizer only ever sees the adapter (and
head) pytrees — no trainable-mask bookkeeping needed.

Target-module selection mirrors the reference's variants (SURVEY.md §2.3):
  * 'qkvo'  — q,k,v,out projections (Signal_vs_Noise, Glitch, MLGWSC-1)
  * 'kv'    — k,v only (Efficiency_test; matches the shipped adapter_config)
Adapters are stacked along a leading n_layers axis to match
params['layers'] and flow through the encoder's lax.scan.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gwkit.models.whisper import WhisperConfig

PROJ_KEYS = ("q", "k", "v", "o")
TARGET_PRESETS: Dict[str, Sequence[str]] = {
    "qkvo": ("q", "k", "v", "o"),
    "qkv": ("q", "k", "v"),
    "kv": ("k", "v"),
    "qv": ("q", "v"),
}
# our key -> HF module name inside WhisperEncoder layers
_HF_PROJ = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "out_proj"}


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    r: int = 8
    alpha: int = 32
    use_dora: bool = True
    targets: str = "qkvo"  # preset name or comma-separated subset of q,k,v,o

    @property
    def scaling(self) -> float:
        return self.alpha / self.r

    @property
    def target_keys(self) -> Sequence[str]:
        if self.targets in TARGET_PRESETS:
            return TARGET_PRESETS[self.targets]
        return tuple(t.strip() for t in self.targets.split(","))


def init_adapters(key, cfg: WhisperConfig, acfg: AdapterConfig, encoder_params) -> Any:
    """Initialize stacked adapters: A ~ kaiming_uniform(a=sqrt(5)), B = 0,
    magnitude m = row-norm of W0 (so the initial forward is exactly the base
    model) — identical to peft's DoRA init."""
    d = cfg.d_model
    out = {}
    keys = jax.random.split(key, len(acfg.target_keys))
    for tkey, k in zip(acfg.target_keys, keys):
        w0 = encoder_params["layers"][tkey]["w"]  # (L, d_in, d_out)
        L, d_in, d_out = w0.shape
        # kaiming_uniform(a=sqrt(5)) on a (r, d_in) torch matrix -> U(±1/sqrt(d_in))
        bound = 1.0 / math.sqrt(d_in)
        a = jax.random.uniform(k, (L, d_in, acfg.r), jnp.float32, -bound, bound)
        b = jnp.zeros((L, acfg.r, d_out), jnp.float32)
        entry = {"a": a, "b": b, "scaling": jnp.full((L,), acfg.scaling, jnp.float32)}
        if acfg.use_dora:
            entry["m"] = jnp.sqrt(jnp.sum(w0 * w0, axis=1))  # (L, d_out); B=0 => norm(W0)
        out[tkey] = entry
    return out


def empty_adapters(cfg: WhisperConfig, acfg: AdapterConfig, encoder_params) -> Any:
    """Adapters for *all four* projections; non-target entries are identity
    (r used but B=0 and excluded from training). Useful when a uniform pytree
    across q/k/v/o is preferred. Usually init_adapters is what you want."""
    key = jax.random.PRNGKey(0)
    return init_adapters(key, cfg, dataclasses.replace(acfg, targets="qkvo"), encoder_params)


def n_trainable(adapters) -> int:
    return sum(int(np.prod(x.shape)) for p in adapters.values() for k, x in p.items() if k != "scaling")


# -----------------------------------------------------------------------------
# peft interop: import/export HF-compatible LoRA/DoRA checkpoints
# (reference export surface: peft save_pretrained dirs with
#  adapter_config.json + adapter_model.safetensors — MLGWSC-1/train.py:723-737)
# -----------------------------------------------------------------------------

def _peft_key(layer: int, proj: str, part: str) -> str:
    # peft names under a wrapped WhisperEncoder:
    # base_model.model.layers.{i}.self_attn.{proj}.{part}.weight
    return f"base_model.model.layers.{layer}.self_attn.{_HF_PROJ[proj]}.{part}"


def export_peft_dir(path: str, adapters, acfg: AdapterConfig, n_layers: int) -> None:
    """Write a peft-loadable adapter directory (adapter_config.json + safetensors)."""
    os.makedirs(path, exist_ok=True)
    tensors = {}
    for proj, entry in adapters.items():
        a = np.asarray(entry["a"])  # (L, d_in, r)
        b = np.asarray(entry["b"])  # (L, r, d_out)
        for i in range(n_layers):
            tensors[_peft_key(i, proj, "lora_A") + ".weight"] = a[i].T.copy()  # (r, d_in)
            tensors[_peft_key(i, proj, "lora_B") + ".weight"] = b[i].T.copy()  # (d_out, r)
            if "m" in entry:
                tensors[_peft_key(i, proj, "lora_magnitude_vector")] = np.asarray(entry["m"][i]).copy()
    _write_safetensors(os.path.join(path, "adapter_model.safetensors"), tensors)
    config = {
        "peft_type": "LORA",
        "r": acfg.r,
        "lora_alpha": acfg.alpha,
        "use_dora": acfg.use_dora,
        "lora_dropout": 0.0,
        "target_modules": sorted(
            {f"layers.{i}.self_attn.{_HF_PROJ[p]}" for p in adapters for i in range(n_layers)}
        ),
        "bias": "none",
        "task_type": None,
    }
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)


def import_peft_dir(path: str, n_layers: int) -> tuple[Any, AdapterConfig]:
    """Load a peft adapter dir (e.g. the reference's shipped best_lora_weights)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    tensors = _read_safetensors(os.path.join(path, "adapter_model.safetensors"))
    proj_of = {v: k for k, v in _HF_PROJ.items()}
    found: Dict[str, Dict[str, list]] = {}
    for name, arr in tensors.items():
        parts = name.split(".")
        try:
            layer = int(parts[parts.index("layers") + 1])
            hf_proj = parts[parts.index("self_attn") + 1]
        except (ValueError, IndexError):
            continue
        proj = proj_of[hf_proj]
        slot = found.setdefault(proj, {"a": [None] * n_layers, "b": [None] * n_layers, "m": [None] * n_layers})
        if "lora_A" in name:
            slot["a"][layer] = arr.T  # (d_in, r)
        elif "lora_B" in name:
            slot["b"][layer] = arr.T  # (r, d_out)
        elif "magnitude" in name:
            slot["m"][layer] = arr
    use_dora = bool(cfg.get("use_dora", False))
    acfg = AdapterConfig(r=cfg["r"], alpha=cfg["lora_alpha"], use_dora=use_dora,
                         targets=",".join(sorted(found.keys())))
    adapters = {}
    for proj, slot in found.items():
        entry = {
            "a": jnp.asarray(np.stack(slot["a"])),
            "b": jnp.asarray(np.stack(slot["b"])),
            "scaling": jnp.full((n_layers,), acfg.scaling, jnp.float32),
        }
        if use_dora and slot["m"][0] is not None:
            entry["m"] = jnp.asarray(np.stack(slot["m"]))
        adapters[proj] = entry
    return adapters, acfg


def _write_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    try:
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)
    except ImportError:  # minimal fallback writer
        np.savez(path + ".npz", **tensors)


def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    try:
        from safetensors.numpy import load_file

        return load_file(path)
    except ImportError:
        return dict(np.load(path + ".npz"))
