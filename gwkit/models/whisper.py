"""Whisper encoder backbone in functional JAX.

Architecture parity with HF ``WhisperModel(...).encoder`` (the reference's
backbone — MLGWSC-1/train.py:658-663, Signal_vs_Noise/src/train.py:227-240):

  mel (B, 80, 3000)
  -> Conv1d(80, d, k=3, s=1, p=1) + GELU
  -> Conv1d(d, d, k=3, s=2, p=1) + GELU        -> (B, 1500, d)
  -> + sinusoidal positions
  -> n_layers pre-LN transformer blocks
     (self-attention with q-scaling, k_proj bias-free; GELU MLP 4x)
  -> final LayerNorm

TPU-first details:
  * layers are stacked along a leading axis and run under ``lax.scan``
    (single compiled block; uniform sharding axis; optional remat =
    the reference's ``gradient_checkpointing_enable()``).
  * matmuls run in a configurable ``compute_dtype`` (bf16 on TPU) with
    params kept in fp32; attention softmax is always fp32.
  * attention can route through the Pallas flash-attention kernel
    (gwkit.ops.attention) on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gwkit.ops.dora import dora_linear

Params = Any


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 4
    d_ff: int = 1536
    max_positions: int = 1500
    compute_dtype: Any = jnp.float32
    remat: bool = False
    use_flash_attention: bool = False
    gelu_approx: bool = False  # tanh GELU (~1e-3 rel diff vs erf, saves VPU transcendentals)
    fused_mlp: bool = False  # Pallas LN+MLP+residual kernel (TPU only)
    fused_block: bool = False  # whole-layer Pallas kernel (gwkit.ops.fused_block, TPU only)
    quant_int8: bool = False  # int8 projections inside the fused block (inference; v5e+ MXU)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# HF config values for openai/whisper-{size}; selectable via --encoder
# (reference: Signal_vs_Noise/run_train.py:20).
PRESETS = {
    "tiny": dict(d_model=384, n_heads=6, n_layers=4, d_ff=1536),
    "base": dict(d_model=512, n_heads=8, n_layers=6, d_ff=2048),
    "small": dict(d_model=768, n_heads=12, n_layers=12, d_ff=3072),
    "medium": dict(d_model=1024, n_heads=16, n_layers=24, d_ff=4096),
    "large": dict(d_model=1280, n_heads=20, n_layers=32, d_ff=5120),
}


def config_for(size: str = "tiny", **overrides) -> WhisperConfig:
    return WhisperConfig(**{**PRESETS[size], **overrides})


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal position table (stored as a weight by HF)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def _linear_init(key, d_in, d_out, bias=True):
    # torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in))
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def init_encoder_params(key, cfg: WhisperConfig) -> Params:
    """Random-init params with the same init family as torch (for from-scratch runs;
    pretrained weights come from gwkit.models.hf_io.load_hf_encoder)."""
    keys = jax.random.split(key, 4 + cfg.n_layers)
    d, f = cfg.d_model, cfg.d_ff

    def conv_init(k, c_in, c_out, width):
        kw, kb = jax.random.split(k)
        bound = 1.0 / np.sqrt(c_in * width)
        return {
            "w": jax.random.uniform(kw, (width, c_in, c_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
        }

    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": _ln_init(d),
            "q": _linear_init(ks[0], d, d),
            "k": _linear_init(ks[1], d, d, bias=False),
            "v": _linear_init(ks[2], d, d),
            "o": _linear_init(ks[3], d, d),
            "mlp_ln": _ln_init(d),
            "fc1": _linear_init(ks[4], d, f),
            "fc2": _linear_init(ks[5], f, d),
        }

    layers = [layer_init(k) for k in keys[4:]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    return {
        "conv1": conv_init(keys[0], cfg.n_mels, d, 3),
        "conv2": conv_init(keys[1], d, d, 3),
        "pos": jnp.asarray(sinusoid_positions(cfg.max_positions, d)),
        "layers": stacked,
        "ln_post": _ln_init(d),
    }


def _layer_norm(x, p, eps=1e-5):
    # stats accumulate in f32; the normalized tensor stays in the compute
    # dtype (bf16 on TPU) — the f32 upcast would double the HBM traffic of
    # the residual stream, which dominates the encoder's VPU passes
    mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * scale
    return y * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


def _proj(x, p, adapter=None):
    """Linear (optionally DoRA-fused) projection: x @ w + b."""
    if adapter is not None:
        return dora_linear(x, p["w"], p.get("b"), adapter)
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _attention(x, p, cfg: WhisperConfig, adapters=None):
    B, T, D = x.shape
    H, hd = cfg.n_heads, cfg.head_dim
    ad = adapters or {}
    q = _proj(x, p["q"], ad.get("q")) * (hd ** -0.5)
    k = _proj(x, p["k"], ad.get("k"))
    v = _proj(x, p["v"], ad.get("v"))
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, H, hd)
    v = v.reshape(B, T, H, hd)
    # The Pallas flash kernel wins at long contexts (1.7x at T=1500, where
    # the T^2 score matrix stresses HBM) but its fold/unfold transposes and
    # grid overhead lose to XLA's fused path at short ones (0.6x at T=256);
    # T is static under jit, so select per compiled geometry.
    if cfg.use_flash_attention and T >= 1024:
        from gwkit.ops.attention import flash_attention

        o = flash_attention(q, k, v)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    o = o.reshape(B, T, D)
    return _proj(o, p["o"], ad.get("o"))


def _block(x, p, cfg: WhisperConfig, adapters=None):
    if cfg.fused_block:
        from gwkit.ops.fused_block import fused_encoder_block

        interpret = jax.devices()[0].platform == "cpu"
        return fused_encoder_block(x, p, cfg.n_heads, adapters,
                                   approx=cfg.gelu_approx, interpret=interpret,
                                   quant=cfg.quant_int8)
    h = _layer_norm(x, p["attn_ln"])
    x = x + _attention(h, p, cfg, adapters)
    if cfg.fused_mlp:
        from gwkit.ops.fused_mlp import fused_mlp_block

        return fused_mlp_block(
            x, p["mlp_ln"]["g"], p["mlp_ln"]["b"],
            p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
            approx=cfg.gelu_approx,
        )
    h = _layer_norm(x, p["mlp_ln"])
    h = jax.nn.gelu(_proj(h, p["fc1"]), approximate=cfg.gelu_approx)
    x = x + _proj(h, p["fc2"])
    return x


def _conv1d(x, p, stride):
    """k=3 SAME conv as ONE tap-concatenated MXU matmul.

    lax.conv's TPU lowering measured 5.3 ms for the two stem convs at B=64
    (docs/PERF.md); concatenating the three taps along features and doing a
    single (B*T_out, 3C) @ (3C, D) matmul keeps the MXU contraction wide
    (240 / 1152 for whisper-tiny) and identical math (same FLOPs, one dot)."""
    B, T, C = x.shape
    w = p["w"]  # (3, C_in, C_out)
    if w.shape[0] != 3 or (stride == 2 and T % 2) or stride > 2:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=((1, 1),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + p["b"]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    taps = [xp[:, j:T + j:stride] for j in range(3)]
    x3 = jnp.concatenate(taps, axis=-1)  # (B, T_out, 3C), tap-major like w.reshape
    return x3 @ w.reshape(3 * C, w.shape[2]) + p["b"]


def encoder_apply(
    cfg: WhisperConfig,
    params: Params,
    mel: jnp.ndarray,
    adapters: Optional[Params] = None,
) -> jnp.ndarray:
    """Whisper encoder forward: mel (B, n_mels, 3000) -> (B, 1500, d_model).

    ``adapters``: optional stacked DoRA/LoRA pytree from gwkit.models.adapters
    with per-projection entries keyed 'q'/'k'/'v'/'o' (leading n_layers axis,
    like params['layers']).
    """
    dt = cfg.compute_dtype
    x = jnp.swapaxes(mel, -1, -2).astype(dt)  # (B, T=3000, n_mels)
    x = jax.nn.gelu(_conv1d(x, jax.tree.map(lambda a: a.astype(dt), params["conv1"]), 1), approximate=cfg.gelu_approx)
    x = jax.nn.gelu(_conv1d(x, jax.tree.map(lambda a: a.astype(dt), params["conv2"]), 2), approximate=cfg.gelu_approx)
    x = x + params["pos"][: x.shape[1]].astype(dt)

    block = _block
    if cfg.remat:
        block = jax.checkpoint(block, static_argnums=(2,))

    def scan_body(carry, layer_in):
        lp, la = layer_in
        return block(carry, lp, cfg, la), None

    layer_params = jax.tree.map(lambda a: a.astype(dt), params["layers"])
    if adapters is not None:
        layer_adapters = jax.tree.map(lambda a: a.astype(dt), adapters)
        x, _ = jax.lax.scan(lambda c, xs: scan_body(c, xs), x, (layer_params, layer_adapters))
    else:
        x, _ = jax.lax.scan(lambda c, lp: (block(c, lp, cfg, None), None), x, layer_params)

    return _layer_norm(x, params["ln_post"])
