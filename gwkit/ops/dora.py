"""Fused DoRA linear: weight-decomposed low-rank adaptation without
materializing the effective weight.

Semantics match peft's ``use_dora=True`` LoRA variant (the reference wraps the
Whisper encoder's attention projections with it — MLGWSC-1/train.py:666-702,
Signal_vs_Noise/src/train.py:230-269):

  W_eff = m ⊙_rows (W0 + s·ΔW) / ||W0 + s·ΔW||_row,   ΔW = B @ A,  s = alpha/r
  y     = x @ W_eff^T + bias          (bias NOT rescaled, per peft)

with the row norm ||·|| treated as a constant under differentiation
(stop_gradient), as in the DoRA paper / peft implementation.

TPU-first detail: the row norms of (W0 + s·ΔW) are computed via the
factorization

  ||w_j||^2 = ||W0_j||^2 + 2 s ⟨(A W0)_·j, b_·j⟩ + s^2 (b_j^T (A A^T) b_j)

which costs O(r · d_in · d_out) — the same order as the low-rank forward —
instead of materializing the (d_in, d_out) effective weight. This keeps DoRA
fused into the projection matmuls for every Whisper size.

Storage layout (right-multiplication): W0 (d_in, d_out); a (d_in, r);
b (r, d_out); m (d_out,). peft's (out, in) matrices are transposed on import.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dora_row_norms(w0: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, scaling: float) -> jnp.ndarray:
    """Column norms (over d_in) of (w0 + scaling * a @ b) without materializing it.

    Accumulates in f32 regardless of the (possibly bf16) weight dtype — the
    norm factorization is O(r*d_in*d_out), negligible next to the batch
    matmuls, and bf16 squared-sums would lose the norm's low bits.
    """
    w0 = w0.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c0 = jnp.sum(w0 * w0, axis=0)  # (d_out,)
    m = a.T @ w0  # (r, d_out)
    cross = jnp.sum(m * b, axis=0)  # (d_out,)
    g = a.T @ a  # (r, r)
    quad = jnp.sum((g @ b) * b, axis=0)  # (d_out,)
    norm_sq = c0 + 2.0 * scaling * cross + (scaling * scaling) * quad
    return jnp.sqrt(jnp.maximum(norm_sq, 1e-12))


def dora_linear(
    x: jnp.ndarray,
    w0: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    adapter: dict,
) -> jnp.ndarray:
    """y = m/||W0+s·BA|| ⊙ (x @ W0 + s · (x @ a) @ b) + bias.

    ``adapter``: {'a': (d_in, r), 'b': (r, d_out), 'm': (d_out,) or absent for
    plain LoRA, 'scaling': scalar array or python float}.
    """
    a, b = adapter["a"], adapter["b"]
    scaling = adapter.get("scaling", 1.0)
    base = x @ w0
    low_rank = (x @ a) @ b
    y = base + scaling * low_rank
    if "m" in adapter:
        norms = dora_row_norms(w0, a, b, scaling)  # f32 accumulation
        norms = jax.lax.stop_gradient(norms)  # DoRA paper / peft: norm is constant wrt grads
        scale = (adapter["m"].astype(jnp.float32) / norms).astype(y.dtype)
        y = y * scale
    if bias is not None:
        y = y + bias
    return y
