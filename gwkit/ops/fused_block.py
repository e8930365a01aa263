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
import cycle) under jax.vjp, with the attention core routed through the
Pallas flash forward/backward kernels (gwkit.ops.attention) so the
recompute never materializes the (B, H, T, T) probability tensor in HBM —
same function, gradients exact to fp rounding.

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
from gwkit.ops.fused_mlp import _fused_mlp_impl


def _divisor_tile(tp: int, want: int) -> int:
    """Largest multiple-of-128 divisor of ``tp`` that is <= ``want``.

    Every row-tiled stage iterates ``tp // tile`` times, so the tile MUST
    divide the 128-padded length exactly — a truncating ``tp // tile`` with a
    non-divisor tile silently skips the tail rows (uninitialized scratch fed
    downstream). ``tp`` is always a multiple of 128, so 128 itself is always
    a valid fallback and the loop terminates.
    """
    want = min(want, tp)
    cand = (want // 128) * 128
    while cand >= 128:
        if tp % cand == 0:
            return cand
        cand -= 128
    return tp  # unreachable for tp >= 128 (tp is 128-padded); keep total cover


def _ln_f32(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * g.astype(x.dtype) + b.astype(x.dtype)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _quantize_rows(h):
    """Per-row symmetric int8 quantization of an (R, D) f32 tile.

    Returns (int8 values, (R, 1) f32 scales). The scale floor keeps all-zero
    rows finite (they quantize to zeros with scale 1/127)."""
    sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.round(h / sx), -127.0, 127.0).astype(jnp.int8)
    return q, sx


def _quantize_cols(w):
    """Per-column symmetric int8 quantization of a (D_in, D_out) f32 weight.

    Returns (int8 values, (D_out,) f32 scales)."""
    w = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / sw), -127.0, 127.0).astype(jnp.int8)
    return q, sw


def _qdot(h, wq, sw, bias=None):
    """Quantized projection: per-row-quantize ``h`` (f32), int8 x int8 dot on
    the MXU with int32 accumulation, dequantize with row x column scales.
    Same math in-kernel and in the jnp reference (exact-match testable)."""
    hq, sx = _quantize_rows(h.astype(jnp.float32))
    y = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * sw.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def _attn_block_kernel(
    # refs: x, ln1 g/b, concatenated effective qkv projection (w, bias) and
    # the o projection; out is x1 = x + o-proj(attention) and doubles as
    # the attention-head accumulator. DoRA is folded into the DENSE
    # effective weights OUTSIDE the kernel (O(r d^2) once per call) —
    # in-kernel thin low-rank matmuls measured ~1.5 ms/layer of pure
    # MXU-underfill overhead. q/k/v are ONE (D, 3D) matmul per row tile
    # (q_scale and absent biases folded in at build time): one pass over
    # the LN output instead of three, N=3D lanes per MXU pass.
    x_ref, g1_ref, bb1_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    g2_ref, bb2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    *rest,
    n_heads: int, t_valid: int, block_q: int, block_f: int,
    o_bias: bool, approx: bool, skip_mlp: bool = False,
    quant: bool = False, ablate: str = "",
):
    # quant mode appends per-column f32 scale operands for the int8 weights
    # (qkv, o, fc1, fc2) between the weight refs and the output/scratch refs.
    if quant:
        sqkv_ref, so_ref, s1_ref, s2_ref = rest[:4]
        rest = rest[4:]
    o_ref, h_s, q_s, k_s = rest
    dt = x_ref.dtype
    tp = h_s.shape[0]
    # Every non-attention stage is row-tiled: a full-width (Tp, D) f32
    # intermediate is 2.4 MB for whisper-tiny and Mosaic stacks them — the
    # untiled kernel version exceeded the 16 MB VMEM budget at compile time.
    block_r = _divisor_tile(tp, 512)
    n_r = tp // block_r
    assert n_r * block_r == tp and tp % block_q == 0 and tp % block_f == 0, (
        "fused-block tiles must divide the padded length", tp, block_r, block_q, block_f)
    d = h_s.shape[1]

    def rows(i):
        return pl.ds(i * block_r, block_r)

    # LN + fused qkv per row tile (fori_loop: temps allocate once, not per
    # trip). v overwrites the h tile AFTER it is consumed by the matmul.
    def ln_qkv_tile(ri, _):
        sl = rows(ri)
        hb = _ln_f32(x_ref[0, sl, :], g1_ref[...], bb1_ref[...])
        if quant:
            y = _qdot(hb, wqkv_ref[...], sqkv_ref[...], bqkv_ref[...])
        else:
            y = _dot(hb, wqkv_ref[...]) + bqkv_ref[...].astype(jnp.float32)
        q_s[sl, :] = y[:, :d].astype(dt)
        k_s[sl, :] = y[:, d:2 * d].astype(dt)
        h_s[sl, :] = y[:, 2 * d:].astype(dt)
        return 0

    jax.lax.fori_loop(0, n_r, ln_qkv_tile, 0)
    v_s = h_s

    # attention per head / q-block; head outputs accumulate in o_ref.
    # Softmax is the VPU wall at long T (T^2 elements per head): exp runs at
    # the compute dtype's lane rate, and the denominator divides the (bq, hd)
    # OUTPUT of p @ v rather than the (bq, T) probability matrix — same math
    # (matmul is linear in p), T/hd-fold fewer divisions.
    hd = d // n_heads
    # Key-padding mask: tp = ceil(T/128)*128, so the masked tail always sits
    # inside the FINAL 128-column tile. The softmax therefore splits into an
    # unmasked main span [0, k1) and a 128-wide masked tail — one (bq, 128)
    # `where` instead of a full (bq, tp) masking pass (exact same math).
    k1 = (t_valid // 128) * 128 if t_valid < tp else tp
    tail_mask = None
    if k1 < tp:
        tail_mask = (jax.lax.broadcasted_iota(jnp.int32, (block_q, tp - k1), 1)
                     + k1) < t_valid
    for hi in range(n_heads):  # head slices are static (lane-aligned offsets)
        kh = k_s[:, hi * hd:(hi + 1) * hd]
        vh = v_s[:, hi * hd:(hi + 1) * hd]

        def q_block(qi, _):
            # fori_loop (not an unrolled python loop): Mosaic allocates the
            # softmax temps ONCE for the loop body — unrolled, the per-block
            # f32 score/exp temps stack up and blow the 16 MB VMEM budget
            qb = q_s[pl.ds(qi * block_q, block_q), hi * hd:(hi + 1) * hd]
            if ablate == "noattn":
                o_ref[0, pl.ds(qi * block_q, block_q), hi * hd:(hi + 1) * hd] = qb
                return 0
            scores = jax.lax.dot_general(
                qb, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if ablate == "nosoftmax":
                o = _dot(scores.astype(dt), vh)
            else:
                # exact per-row max shift (reference softmax semantics at ANY
                # score scale): after the shift every exponent is <= 0, so p
                # never overflows and the denominator is >= 1 (the max element
                # contributes exp(0)) — NaN/Inf are impossible by construction.
                # A constant-shift variant (round 2) saved the (bq, T) max
                # reduce but silently diverged for |scores| > ~60 (clamp) or
                # rows entirely below ~-67 (bf16 underflow -> denom 0 -> NaN).
                if tail_mask is None:
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    p = jnp.exp((scores - m).astype(dt))
                    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                    o = _dot(p, vh) / denom
                elif k1 == 0:  # T < 128: the single tile IS the masked tail
                    s_tail = jnp.where(tail_mask, scores, -jnp.inf)
                    m = jnp.max(s_tail, axis=-1, keepdims=True)
                    p = jnp.exp((s_tail - m).astype(dt))
                    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
                    o = _dot(p, vh) / denom
                else:
                    s_main = jax.lax.slice_in_dim(scores, 0, k1, axis=1)
                    s_tail = jnp.where(
                        tail_mask, jax.lax.slice_in_dim(scores, k1, tp, axis=1),
                        -jnp.inf)
                    m = jnp.maximum(
                        jnp.max(s_main, axis=-1, keepdims=True),
                        jnp.max(s_tail, axis=-1, keepdims=True))
                    p_main = jnp.exp((s_main - m).astype(dt))
                    p_tail = jnp.exp((s_tail - m).astype(dt))
                    denom = (jnp.sum(p_main, axis=-1, keepdims=True, dtype=jnp.float32)
                             + jnp.sum(p_tail, axis=-1, keepdims=True, dtype=jnp.float32))
                    o = (_dot(p_main, vh[:k1]) + _dot(p_tail, vh[k1:])) / denom
            o_ref[0, pl.ds(qi * block_q, block_q), hi * hd:(hi + 1) * hd] = o.astype(dt)
            return 0

        jax.lax.fori_loop(0, tp // block_q, q_block, 0)

    # o-projection + residual -> x1 overwrites the accumulated heads (the
    # o-proj is row-wise, so tile-local read-modify-write is safe)
    def o_tile(ri, _):
        sl = rows(ri)
        if quant:
            y = _qdot(o_ref[0, sl, :].astype(jnp.float32), wo_ref[...], so_ref[...])
        else:
            y = _dot(o_ref[0, sl, :], wo_ref[...])
        if o_bias:
            y = y + bo_ref[...].astype(jnp.float32)
        o_ref[0, sl, :] = x_ref[0, sl, :] + y.astype(dt)
        return 0

    jax.lax.fori_loop(0, n_r, o_tile, 0)

    if skip_mlp:
        return
    # LN2 + MLP + residual in the same kernel (mega mode: saves the x1 HBM
    # round trip between the attention and MLP kernels, ~5% end to end).
    # fori_loop, not an unrolled range: temps allocate once.
    def mlp_tile(fi, _):
        sl = pl.ds(fi * block_f, block_f)
        hb = _ln_f32(o_ref[0, sl, :], g2_ref[...], bb2_ref[...])
        if quant:
            a1 = _qdot(hb, w1_ref[...], s1_ref[...], b1_ref[...])
            a1 = jax.nn.gelu(a1.astype(dt), approximate=approx)
            yb = _qdot(a1.astype(jnp.float32), w2_ref[...], s2_ref[...],
                       b2_ref[...])
        else:
            a1 = _dot(hb, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
            a1 = jax.nn.gelu(a1.astype(dt), approximate=approx)
            yb = _dot(a1, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
        o_ref[0, sl, :] = o_ref[0, sl, :] + yb.astype(dt)
        return 0

    jax.lax.fori_loop(0, tp // block_f, mlp_tile, 0)


def _attn_only_kernel(
    x_ref, g1_ref, bb1_ref,
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    *rest, **kw,
):
    """Attention-block-only variant for the VMEM-fallback path: takes NO MLP
    operands, so the fallback actually sheds the fc1/fc2 VMEM residency that
    triggered it (the full kernel would keep ~4-6 MB of unused MLP weights
    resident even with skip_mlp=True). In quant mode ``rest`` starts with the
    qkv/o column-scale refs (no MLP scales)."""
    scales = ()
    if kw.get("quant"):
        scales = (*rest[:2], None, None)
        rest = rest[2:]
    o_ref, h_s, q_s, k_s = rest
    _attn_block_kernel(
        x_ref, g1_ref, bb1_ref,
        wqkv_ref, bqkv_ref, wo_ref, bo_ref,
        None, None, None, None, None, None,
        *scales,
        o_ref, h_s, q_s, k_s, skip_mlp=True, **kw)


def _effective_proj(p_entry, adapter, dtype):
    """((w_eff, bias), has_bias): the DENSE effective projection weight with
    DoRA folded in — W_eff = colscale ⊙ (W0 + s·A@B), colscale =
    m/||W0 + s·A@B|| (stop-gradient, per the DoRA paper). Materializing
    W_eff costs O(r·d²) outside the kernel and is (d,d) small; gradients
    never flow through this path (custom_vjp backward uses the reference
    math), so the fused-DoRA factorization only matters for training."""
    w = p_entry["w"].astype(jnp.float32)
    bias = p_entry.get("b")
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((w.shape[1],), jnp.float32)
    if adapter is not None:
        s = adapter.get("scaling", 1.0)
        w_eff = w + jnp.asarray(s, jnp.float32) * (
            adapter["a"].astype(jnp.float32) @ adapter["b"].astype(jnp.float32))
        if "m" in adapter:
            norms = jax.lax.stop_gradient(
                dora_row_norms(p_entry["w"], adapter["a"], adapter["b"], s))
            w_eff = w_eff * (adapter["m"].astype(jnp.float32) / norms)
    else:
        w_eff = w
    return (w_eff.astype(dtype), bias), has_bias


def _reference_block(x, p, adapters, n_heads: int, approx: bool,
                     flash: bool = False, interpret: bool = False,
                     quant: bool = False):
    """Unfused math (gwkit.models.whisper._block semantics) for the backward
    pass and for equality tests.

    ``flash=True`` swaps the einsum attention core for the Pallas flash
    kernel (gwkit.ops.attention) — same softmax-attention function, so
    values/gradients agree to fp rounding, but neither the recompute nor
    its backward ever writes the (B, H, T, T) probability tensor to HBM
    (~0.9 GB per direction per layer at the training geometry).

    ``quant=True`` mirrors the kernel's int8 projection path exactly
    (DoRA-folded per-column weight quant + per-row activation quant via the
    shared _quantize_cols/_qdot helpers) so the quantized kernel is testable
    against this reference at fp tolerance."""
    ad = adapters or {}
    B, T, D = x.shape
    hd = D // n_heads

    def prj(name, h):
        if quant:
            (w_eff, bias), has_bias = _effective_proj(p[name], ad.get(name),
                                                      jnp.float32)
            wq, sw = _quantize_cols(w_eff)
            y = _qdot(h.reshape(-1, h.shape[-1]), wq, sw,
                      bias if has_bias else None)
            return y.reshape(*h.shape[:-1], -1).astype(x.dtype)
        entry = {k: v.astype(x.dtype) for k, v in p[name].items()}
        return dora_linear(h, entry["w"], entry.get("b"), ad[name]) if name in ad \
            else (h @ entry["w"] + entry["b"] if "b" in entry else h @ entry["w"])

    h = _ln_f32(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
    q = (prj("q", h) * (hd ** -0.5)).reshape(B, T, n_heads, hd)
    k = prj("k", h).reshape(B, T, n_heads, hd)
    v = prj("v", h).reshape(B, T, n_heads, hd)
    if flash:
        from gwkit.ops.attention import flash_attention

        o = flash_attention(q, k, v, interpret=interpret).reshape(B, T, D)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    x1 = x + prj("o", o)
    h2 = _ln_f32(x1, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
    h2 = jax.nn.gelu(prj("fc1", h2), approximate=approx)
    return x1 + prj("fc2", h2.astype(x.dtype))


def _fused_impl(x, p, adapters, n_heads, approx, interpret, block_q=256, block_f=256,
                quant=False):
    B, T, D = x.shape
    dt = x.dtype
    ad = adapters or {}
    tp = -(-T // 128) * 128
    block_q = _divisor_tile(tp, block_q)
    block_f = _divisor_tile(tp, block_f)

    # Even the attention-only fallback kernel needs 7 (tp, D) VMEM buffers
    # (double-buffered in/out + 3 scratches) plus resident qkvo weights; at
    # f32 and tiny/T=1536 that is 17.7 MB against the 16 MB scoped limit
    # (v5e measured the OOM at 17.25M). Those geometries run the reference
    # math with the flash-attention core, whose tiling fits any dtype;
    # bf16 base/T=1536 (13.1 MB) keeps the split-kernel path.
    _db = jnp.dtype(dt).itemsize
    _wdb = 1 if quant else _db
    attn_est = 7 * tp * D * _db + 4 * D * D * _wdb
    if attn_est > 16 * (1 << 20):
        return _reference_block(x, p, adapters, n_heads, approx,
                                flash=not interpret, interpret=interpret,
                                quant=quant)
    xp = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0))) if tp != T else x

    # Effective projections (DoRA folded). q/k/v concatenate into ONE
    # (D, 3D) weight with the 1/sqrt(hd) query scale folded into the q
    # columns (and bias): q = (h@Wq + bq)*s == h@(s*Wq) + s*bq. Projections
    # without a bias get zeros — adding them is a no-op, and the fused
    # matmul always adds the concatenated bias.
    q_scale = (D // n_heads) ** -0.5
    eff = {}
    for name in ("q", "k", "v", "o"):
        (w_eff, bias), has_bias = _effective_proj(p[name], ad.get(name), dt)
        eff[name] = (w_eff, bias, has_bias)
    wqkv = jnp.concatenate(
        [eff["q"][0].astype(jnp.float32) * q_scale, eff["k"][0].astype(jnp.float32),
         eff["v"][0].astype(jnp.float32)], axis=1).astype(dt)
    bqkv = jnp.concatenate(
        [eff["q"][1] * q_scale, eff["k"][1], eff["v"][1]], axis=0)
    flat = [xp, p["attn_ln"]["g"], p["attn_ln"]["b"],
            wqkv, bqkv, eff["o"][0], eff["o"][1]]
    F = p["fc1"]["w"].shape[1]
    flat.extend([
        p["mlp_ln"]["g"], p["mlp_ln"]["b"],
        p["fc1"]["w"].astype(dt), p["fc1"]["b"],
        p["fc2"]["w"].astype(dt), p["fc2"]["b"],
    ])
    scales = []
    if quant:
        # int8 weights + per-column f32 scales (appended after the MLP
        # operands; the kernel unpacks them from *rest). Quantization runs
        # at trace time per call — for the search path the weights are
        # constants, so XLA folds it into the compiled program once.
        flat[3], sqkv = _quantize_cols(wqkv)
        flat[5], so = _quantize_cols(eff["o"][0])
        flat[9], s1 = _quantize_cols(p["fc1"]["w"])
        flat[11], s2 = _quantize_cols(p["fc2"]["w"])
        scales = [sqkv, so, s1, s2]
        flat.extend(scales)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim)
    in_specs = [pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0))] + [full(a) for a in flat[1:]]
    db = jnp.dtype(dt).itemsize
    wdb = 1 if quant else db  # int8 weights are 1 byte/elem VMEM-resident
    # VMEM estimate for the single whole-block kernel: double-buffered x/out
    # blocks, 3 scratches, resident weights, and ~4 MB of softmax/MLP temps.
    vmem_est = (4 + 3) * tp * D * db + (4 * D * D + 2 * D * F) * wdb + 4 * (1 << 20)
    kernel_kw = dict(n_heads=n_heads, t_valid=T, block_q=block_q,
                     block_f=block_f, o_bias=eff["o"][2], approx=approx,
                     quant=quant,
                     ablate=__import__("os").environ.get("GWKIT_FUSED_ABLATE", ""))
    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, **kernel_kw),
        out_shape=jax.ShapeDtypeStruct((B, tp, D), dt),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((tp, D), dt) for _ in range(3)],
        interpret=interpret,
    )(*flat) if vmem_est <= 16 * (1 << 20) else None
    if out is None:
        # big geometries (whisper-base+ at T=1500) exceed VMEM in one kernel:
        # run the attention block alone, then the token-tiled MLP kernel
        # (the fallback MLP stays unquantized — it is the rare path and the
        # fused_mlp kernel has no int8 variant)
        attn_flat = flat[:7] + ([scales[0], scales[1]] if quant else [])
        attn_specs = in_specs[:7] + [full(a) for a in attn_flat[7:]]
        x1 = pl.pallas_call(
            functools.partial(_attn_only_kernel, **kernel_kw),
            out_shape=jax.ShapeDtypeStruct((B, tp, D), dt),
            grid=(B,),
            in_specs=attn_specs,
            out_specs=pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((tp, D), dt) for _ in range(3)],
            interpret=interpret,
        )(*attn_flat)
        out = _fused_mlp_impl(
            x1, p["mlp_ln"]["g"], p["mlp_ln"]["b"],
            p["fc1"]["w"].astype(dt), p["fc1"]["b"],
            p["fc2"]["w"].astype(dt), p["fc2"]["b"],
            block_t=block_f, interpret=interpret, approx=approx,
        )
    return out[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fused_vjp(x, p, adapters, n_heads, approx, interpret, block_q, block_f, quant):
    return _fused_impl(x, p, adapters, n_heads, approx, interpret, block_q, block_f,
                       quant)


def _fused_fwd(x, p, adapters, n_heads, approx, interpret, block_q, block_f, quant):
    return (_fused_impl(x, p, adapters, n_heads, approx, interpret, block_q, block_f,
                        quant),
            (x, p, adapters))


def _fused_bwd(n_heads, approx, interpret, block_q, block_f, quant, res, g):
    # quant is inference-oriented; if differentiated anyway, the backward is
    # the full-precision reference gradient (straight-through estimator).
    # Backward = vjp of the unfused math with the FLASH attention core: the
    # recompute runs the Pallas forward kernel and the dq/dk/dv path runs the
    # streaming Pallas backward (gwkit.ops.attention._attn_bwd_kernel), so no
    # T x T tensor ever touches HBM. Everything else (LN/projection/MLP
    # backward) is plain matmuls XLA already runs at MXU rate.
    x, p, adapters = res
    _, vjp = jax.vjp(
        lambda xx, pp, aa: _reference_block(xx, pp, aa, n_heads, approx,
                                            flash=True, interpret=interpret),
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
    block_q: int = 256,
    block_f: int = 256,
    quant: bool = False,
) -> jnp.ndarray:
    """One whole pre-LN transformer block, fused: x (B, T, D) -> (B, T, D).

    ``p``: per-layer param dict (attn_ln, q, k, v, o, mlp_ln, fc1, fc2);
    ``adapters``: optional per-layer DoRA/LoRA dict keyed by projection;
    ``block_q``/``block_f``: attention-score / MLP row-tile sizes (VMEM
    knobs — 256 fits every geometry; 512 trades VMEM for fewer loop trips);
    ``quant``: int8 projections — per-column weight quant (DoRA folded
    first), per-row dynamic activation quant, int8 x int8 -> int32 MXU dots
    (2x the bf16 MXU rate on v5e+); attention core stays bf16. Inference
    path — gradients fall back to the full-precision reference math.
    """
    return _fused_vjp(x, p, adapters, n_heads, approx, interpret, block_q, block_f,
                      quant)
