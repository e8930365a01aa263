"""Fused attention kernel (Pallas, TPU) for the Whisper encoder.

The encoder's 1500-token self-attention is the FLOPs core of every forward
(SURVEY.md §3.1 hot loop). Unfused, XLA materializes the (B, H, T, T)
probability tensor in HBM — at B=32, H=6, T=1536 that is ~0.9 GB of traffic
per direction per layer. This kernel keeps each query block's score row in
VMEM: per (batch*head, q-block) grid cell it computes
 scores = q @ k^T (f32 on the MXU) -> masked row softmax (f32 on the VPU)
 -> probs @ v, never writing scores/probs to HBM.

T=1500 keys x 64 head-dim fit VMEM whole (k, v: ~0.4 MB at bf16), so no
streaming (online-softmax) pass is needed — one shot per query block.
Sequence is padded to a multiple of the 128-lane tile and padded keys are
masked to -inf before the softmax.

Numerical contract: matches the reference jnp path (tests compare in
interpreter mode on CPU); q must arrive pre-scaled (Whisper scales q by
head_dim^-0.5 inside the projection).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int, block_q: int):
    """One (batch*head) per grid cell; the q axis is walked with an internal
    loop so the whole sequence costs ONE kernel invocation (per-invocation
    dispatch overhead dominated the earlier (bh, q-block) grid: 9216 cells of
    ~50 MFLOP each ran 25x off peak)."""
    k = k_ref[0]  # (Tp, hd)
    v = v_ref[0]
    n_blocks = q_ref.shape[1] // block_q

    def body(i, _):
        q = q_ref[0, pl.ds(i * block_q, block_q), :]  # (bq, hd)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, Tp)
        key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(key_ids < t_valid, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        o_ref[0, pl.ds(i * block_q, block_q), :] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, H, hd) pre-scaled q, k, v -> (B, T, H, hd) attention output.

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes attention with the reference jnp math and differentiates that
    (identical values, so gradients are exact; a dedicated backward kernel is
    a future optimization)."""
    return _flash_vjp(q, k, v, block_q, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_vjp(q, k, v, block_q, interpret):
    return _flash_impl(q, k, v, block_q, interpret)


def _flash_fwd(q, k, v, block_q, interpret):
    return _flash_impl(q, k, v, block_q, interpret), (q, k, v)


def _flash_bwd(block_q, interpret, res, g):
    q, k, v = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, g, interpret=interpret)
    return dq, dk, dv


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     dk_acc, dv_acc, *, t_valid: int, block_q: int):
    """Streaming flash backward per (batch*head): recomputes the softmax per
    q-block (no saved T x T probabilities), accumulating dK/dV in f32 VMEM
    scratch. Standard identities:
      P = softmax(QK^T);  dV = P^T dO;  dP = dO V^T;
      D = rowsum(dO * O) = rowsum(dO * (P V));  dS = P*(dP - D);
      dQ = dS K;  dK = dS^T Q.
    """
    k = k_ref[0]
    v = v_ref[0]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    n_blocks = q_ref.shape[1] // block_q

    def body(i, _):
        qb = q_ref[0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(qb, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(key_ids < t_valid, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (bq, Tp) f32
        p_lo = p.astype(v.dtype)
        dv_acc[...] += jax.lax.dot_general(p_lo, dob.astype(v.dtype),
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(dob.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob = jax.lax.dot_general(p_lo, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d = jnp.sum(dob * ob, axis=-1, keepdims=True)
        ds = (p * (dp - d)).astype(q_ref.dtype)
        dq_ref[0, pl.ds(i * block_q, block_q), :] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_acc[...] += jax.lax.dot_general(ds, qb, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _flash_bwd_impl(q, k, v, do, block_q: int = 256, interpret: bool = False):
    B, T, H, hd = q.shape
    tp = -(-T // block_q) * block_q

    def fold(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, hd)
        if tp != T:
            x = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
        return x

    qf, kf, vf, dof = fold(q), fold(k), fold(v), fold(do)
    spec = pl.BlockSpec((1, tp, hd), lambda bh: (bh, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, t_valid=T, block_q=block_q),
        out_shape=[jax.ShapeDtypeStruct((B * H, tp, hd), q.dtype)] * 3,
        grid=(B * H,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        scratch_shapes=[
            pltpu.VMEM((tp, hd), jnp.float32),
            pltpu.VMEM((tp, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof)

    def unfold(x):
        return jnp.swapaxes(x[:, :T].reshape(B, H, T, hd), 1, 2)

    return unfold(dq), unfold(dk), unfold(dv)


def _flash_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, T, H, hd = q.shape
    tp = -(-T // block_q) * block_q

    def fold(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, hd)
        if tp != T:
            x = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
        return x

    qf, kf, vf = fold(q), fold(k), fold(v)
    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_valid=T, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((B * H, tp, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tp, hd), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tp, hd), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tp, hd), lambda bh: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tp, hd), lambda bh: (bh, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :T].reshape(B, H, T, hd)
    return jnp.swapaxes(out, 1, 2)


def reference_attention(q, k, v):
    """Unfused jnp path (identical math, for testing and CPU)."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
