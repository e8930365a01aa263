"""Fully fused Whisper encoder block (Pallas, TPU): one kernel per layer.

The encoder is the largest device-time term of the MLGWSC-1 search
(docs/PERF.md): at the reference (80,3000) geometry ~28 ms of a 42 ms
B=64 forward is VPU/HBM passes — LayerNorms, residual adds, the q/k/v
fold/unfold transposes around attention, and the (B,T,4D) MLP activation
round trip. This kernel computes the ENTIRE pre-LN transformer block

  h   = LN(x)                               (f32 stats)
  q,k,v = DoRA-proj(h)                      (fused low-rank + column scale)
  att = softmax(q k^T / sqrt(hd)) v         (per head, keys masked to T)
  x1  = x + DoRA-proj_o(att)
  out = x1 + W2 gelu(W1 LN(x1) + b1) + b2

for one batch element per grid cell, touching HBM exactly twice per token
(read x, write out). Weights (~3.7 MB for whisper-tiny) stay VMEM-resident
across grid steps via constant index maps.

DoRA follows gwkit.ops.dora's fused form: the column scale
m/||W0 + s·BA|| is precomputed OUTSIDE the kernel (O(r·d²), once per call)
and enters as a (d_out,) vector; the low-rank path runs in-kernel as two
thin matmuls. Projections without an adapter get zero A/B and unit scale.

Differentiable via custom_vjp: backward re-runs the unfused reference math
(gwkit.models.whisper._block semantics, reimplemented here to avoid an
import cycle) under jax.vjp — identical values, exact gradients.

Reference hot loop being replaced: per-detector Whisper encoder forward,
SURVEY.md §3.1-3.3 (MLGWSC-1/inference.py:454-489).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gwkit.ops.dora import dora_linear, dora_row_norms


def _ln_f32(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * g.astype(x.dtype) + b.astype(x.dtype)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _block_kernel(
    # refs: x, ln1 g/b, per-proj (w, a, b_lr, scale, bias) for q,k,v,o,
    # ln2 g/b, w1, b1, w2, b2, out, scratch h, q, k, v
    x_ref, g1_ref, bb1_ref,
    wq_ref, aq_ref, lq_ref, sq_ref, bq_ref,
    wk_ref, ak_ref, lk_ref, sk_ref, bk_ref,
    wv_ref, av_ref, lv_ref, sv_ref, bv_ref,
    wo_ref, ao_ref, lo_ref, so_ref, bo_ref,
    g2_ref, bb2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref, h_s, q_s, k_s, v_s,
    *, n_heads: int, t_valid: int, block_q: int, block_f: int,
    q_scale: float, approx: bool,
):
    x = x_ref[0]  # (Tp, D)
    dt = x.dtype
    h = _ln_f32(x, g1_ref[...], bb1_ref[...])
    h_s[...] = h

    def proj(w_ref, a_ref, l_ref, s_ref, b_ref, scale=1.0):
        y = _dot(h_s[...], w_ref[...])
        y = y + _dot(_dot(h_s[...], a_ref[...]).astype(dt), l_ref[...])
        y = y * s_ref[...].astype(jnp.float32)
        y = y + b_ref[...].astype(jnp.float32)
        return (y * scale).astype(dt)

    q_s[...] = proj(wq_ref, aq_ref, lq_ref, sq_ref, bq_ref, scale=q_scale)
    k_s[...] = proj(wk_ref, ak_ref, lk_ref, sk_ref, bk_ref)
    v_s[...] = proj(wv_ref, av_ref, lv_ref, sv_ref, bv_ref)

    # attention per head / q-block; concatenated head outputs reuse h_s
    tp, d = h_s.shape
    hd = d // n_heads
    for hi in range(n_heads):
        kh = k_s[:, hi * hd:(hi + 1) * hd]
        vh = v_s[:, hi * hd:(hi + 1) * hd]
        for qi in range(tp // block_q):
            qb = q_s[pl.ds(qi * block_q, block_q), hi * hd:(hi + 1) * hd]
            scores = jax.lax.dot_general(
                qb, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(key_ids < t_valid, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
            h_s[pl.ds(qi * block_q, block_q), hi * hd:(hi + 1) * hd] = (
                _dot(p, vh).astype(dt))

    # o-projection + residual -> x1 (kept in o_ref)
    y = _dot(h_s[...], wo_ref[...])
    y = y + _dot(_dot(h_s[...], ao_ref[...]).astype(dt), lo_ref[...])
    y = y * so_ref[...].astype(jnp.float32) + bo_ref[...].astype(jnp.float32)
    o_ref[0] = x + y.astype(dt)

    # LN2 + MLP + residual, row-blocked to bound the (block_f, F) activation
    h2 = _ln_f32(o_ref[0], g2_ref[...], bb2_ref[...])
    q_s[...] = h2  # reuse
    for fi in range(tp // block_f):
        hb = q_s[pl.ds(fi * block_f, block_f), :]
        a1 = _dot(hb, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
        a1 = jax.nn.gelu(a1, approximate=approx).astype(dt)
        yb = _dot(a1, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
        o_ref[0, pl.ds(fi * block_f, block_f), :] = (
            o_ref[0, pl.ds(fi * block_f, block_f), :] + yb.astype(dt))


def _effective_proj(p_entry, adapter, d_model: int, dtype, r_pad: int):
    """(w, a, b_scaled, colscale, bias) with DoRA folded into a column scale
    and s folded into B; identity (zero A/B, unit scale) when no adapter."""
    w = p_entry["w"]
    d_in, d_out = w.shape
    bias = p_entry.get("b")
    if bias is None:
        bias = jnp.zeros((d_out,), jnp.float32)
    if adapter is None:
        a = jnp.zeros((d_in, r_pad), dtype)
        b = jnp.zeros((r_pad, d_out), dtype)
        scale = jnp.ones((d_out,), jnp.float32)
        return w.astype(dtype), a, b, scale, bias
    s = adapter.get("scaling", 1.0)
    a = adapter["a"]
    b = adapter["b"] * jnp.asarray(s, adapter["b"].dtype)
    if a.shape[1] < r_pad:
        a = jnp.pad(a, ((0, 0), (0, r_pad - a.shape[1])))
        b = jnp.pad(b, ((0, r_pad - b.shape[0]), (0, 0)))
    if "m" in adapter:
        norms = jax.lax.stop_gradient(
            dora_row_norms(p_entry["w"], adapter["a"], adapter["b"], s))
        scale = adapter["m"].astype(jnp.float32) / norms
    else:
        scale = jnp.ones((d_out,), jnp.float32)
    return w.astype(dtype), a.astype(dtype), b.astype(dtype), scale, bias


def _reference_block(x, p, adapters, n_heads: int, approx: bool):
    """Unfused math (gwkit.models.whisper._block semantics) for the backward
    pass and for equality tests."""
    ad = adapters or {}
    B, T, D = x.shape
    hd = D // n_heads

    def prj(name, h):
        entry = {k: v.astype(x.dtype) for k, v in p[name].items()}
        return dora_linear(h, entry["w"], entry.get("b"), ad[name]) if name in ad \
            else (h @ entry["w"] + entry["b"] if "b" in entry else h @ entry["w"])

    h = _ln_f32(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
    q = (prj("q", h) * (hd ** -0.5)).reshape(B, T, n_heads, hd)
    k = prj("k", h).reshape(B, T, n_heads, hd)
    v = prj("v", h).reshape(B, T, n_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    x1 = x + prj("o", o)
    h2 = _ln_f32(x1, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
    h2 = jax.nn.gelu(prj("fc1", h2), approximate=approx)
    return x1 + prj("fc2", h2.astype(x.dtype))


def _fused_impl(x, p, adapters, n_heads, approx, interpret):
    B, T, D = x.shape
    dt = x.dtype
    ad = adapters or {}
    r_pad = max([8] + [ad[k]["a"].shape[1] for k in ad])
    tp = -(-T // 128) * 128
    block_q = min(256, tp)
    block_f = min(256, tp)
    xp = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0))) if tp != T else x

    flat = [xp, p["attn_ln"]["g"], p["attn_ln"]["b"]]
    for name in ("q", "k", "v", "o"):
        flat.extend(_effective_proj(p[name], ad.get(name), D, dt, r_pad))
    flat.extend([
        p["mlp_ln"]["g"], p["mlp_ln"]["b"],
        p["fc1"]["w"].astype(dt), p["fc1"]["b"],
        p["fc2"]["w"].astype(dt), p["fc2"]["b"],
    ])
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim)
    in_specs = [pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0))] + [full(a) for a in flat[1:]]
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, n_heads=n_heads, t_valid=T, block_q=block_q,
            block_f=block_f, q_scale=(D // n_heads) ** -0.5, approx=approx),
        out_shape=jax.ShapeDtypeStruct((B, tp, D), dt),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((tp, D), dt) for _ in range(4)],
        interpret=interpret,
    )(*flat)
    return out[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_vjp(x, p, adapters, n_heads, approx, interpret):
    return _fused_impl(x, p, adapters, n_heads, approx, interpret)


def _fused_fwd(x, p, adapters, n_heads, approx, interpret):
    return _fused_impl(x, p, adapters, n_heads, approx, interpret), (x, p, adapters)


def _fused_bwd(n_heads, approx, interpret, res, g):
    x, p, adapters = res
    _, vjp = jax.vjp(
        lambda xx, pp, aa: _reference_block(xx, pp, aa, n_heads, approx),
        x, p, adapters)
    return vjp(g)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


def fused_encoder_block(
    x: jnp.ndarray,
    p: Any,
    n_heads: int,
    adapters: Optional[Any] = None,
    approx: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One whole pre-LN transformer block, fused: x (B, T, D) -> (B, T, D).

    ``p``: per-layer param dict (attn_ln, q, k, v, o, mlp_ln, fc1, fc2);
    ``adapters``: optional per-layer DoRA/LoRA dict keyed by projection.
    """
    return _fused_vjp(x, p, adapters, n_heads, approx, interpret)
