"""Fused LayerNorm -> MLP -> residual Pallas kernel.

The encoder's MLP half costs three HBM round-trips of the residual stream
plus a (B, T, 4D) activation write/read when left to XLA (LN out, fc1 out,
gelu out). This kernel keeps everything for a (token-tile) in VMEM:

  out = x + ( gelu( LN(x) @ W1 + b1 ) @ W2 + b2 )

Weights for whisper-tiny (384x1536 x2, bf16) are ~2.4 MB — they stay
resident across grid steps (constant index map). Differentiable via
custom_vjp: backward re-runs the unfused math under jax.vjp (exact same
values; dedicated backward kernel is future work).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * g.astype(x.dtype) + b.astype(x.dtype)


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, approx: bool):
    x = x_ref[0]  # (bt, D)
    h = _ln(x, g_ref[...], b_ref[...])
    h = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # GELU at the compute dtype: the (bt, F) tanh/erf pass is the kernel's
    # VPU wall (~1.6 ms/layer at B=64, T=1536 in f32); bf16 halves it at
    # ~1e-3 activation error (the bf16 matmul path dominates that anyway)
    h = jax.nn.gelu(h.astype(x.dtype), approximate=approx)
    y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    o_ref[0] = x + y.astype(x.dtype)


def _fused_mlp_impl(x, g, b, w1, b1, w2, b2, block_t: int = 256, interpret: bool = False,
                    approx: bool = False):
    B, T, D = x.shape
    F = w1.shape[1]
    tp = -(-T // block_t) * block_t
    if tp != T:
        x = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
    full = lambda shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, approx=approx),
        out_shape=jax.ShapeDtypeStruct((B, tp, D), x.dtype),
        grid=(B, tp // block_t),
        in_specs=[
            pl.BlockSpec((1, block_t, D), lambda bi, ti: (bi, ti, 0)),
            full((D,)), full((D,)), full((D, F)), full((F,)), full((F, D)), full((D,)),
        ],
        out_specs=pl.BlockSpec((1, block_t, D), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(x, g, b, w1, b1, w2, b2)
    return out[:, :T]


def _unfused(x, g, b, w1, b1, w2, b2, approx=False):
    h = _ln(x, g, b)
    h = jax.nn.gelu((h @ w1 + b1.astype(x.dtype)), approximate=approx)
    return x + (h @ w2 + b2.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_vjp(x, g, b, w1, b1, w2, b2, block_t, interpret, approx):
    return _fused_mlp_impl(x, g, b, w1, b1, w2, b2, block_t, interpret, approx)


def _fused_fwd(x, g, b, w1, b1, w2, b2, block_t, interpret, approx):
    return _fused_mlp_impl(x, g, b, w1, b1, w2, b2, block_t, interpret, approx), (x, g, b, w1, b1, w2, b2)


def _fused_bwd(block_t, interpret, approx, res, dy):
    _, vjp = jax.vjp(lambda *a: _unfused(*a, approx=approx), *res)
    return vjp(dy)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret", "approx"))
def fused_mlp_block(x, g, b, w1, b1, w2, b2, block_t: int = 256, interpret: bool = False,
                    approx: bool = False):
    """x (B, T, D) -> x + MLP(LN(x)); weights right-multiplied ((D,F),(F,D))."""
    return _fused_vjp(x, g, b, w1, b1, w2, b2, block_t, interpret, approx)
