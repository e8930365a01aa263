"""Losses.

* :func:`reg_bce` — BCE over probabilities affinely mapped to (eps, 1-eps*dim)
  so log(0) never occurs; parity with the reference's RegBCELoss
  (MLGWSC-1/train.py:358-370) and reg_BCELoss (Efficiency_test/src/tools.py:181-191).
* :func:`bce_with_logits` — Signal_vs_Noise training loss (src/train.py:271).
* :func:`cross_entropy` — Glitch_classification loss (src/train.py:133).
* :func:`info_nce` — InfoNCE contrastive loss with the reference's exact
  masking/denominator convention (MLGWSC-1/train.py:413-424).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reg_bce(probs: jnp.ndarray, targets: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Regularized BCE on probabilities (targets one-hot, same shape).

    x' = eps + (1 - eps*dim) * x keeps sum(x') = 1 for a probability vector.
    Mean reduction over all elements (torch BCELoss default).
    """
    dim = probs.shape[-1]
    a = epsilon
    b = 1.0 - epsilon * dim
    x = a + b * probs
    return -jnp.mean(targets * jnp.log(x) + (1.0 - targets) * jnp.log1p(-x))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross entropy on logits (mean reduction)."""
    logits = logits.reshape(targets.shape)
    zeros = jnp.zeros_like(logits)
    loss = jnp.maximum(logits, zeros) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross entropy with integer labels (mean reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def info_nce(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """InfoNCE over two views (B, d) with in-batch negatives.

    Exact reference convention: similarities of the 2B-stack, diagonal
    masked out of the denominators, positives are the (z1_i, z2_i) pairs,
    loss = mean_i [-log(pos/denom1_i) - log(pos/denom2_i)].
    """
    z1 = z1 / jnp.linalg.norm(z1, axis=1, keepdims=True).clip(1e-12)
    z2 = z2 / jnp.linalg.norm(z2, axis=1, keepdims=True).clip(1e-12)
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    sim = (z @ z.T) / temperature
    mask = 1.0 - jnp.eye(2 * b, dtype=sim.dtype)
    exp_sim = jnp.exp(sim) * mask
    pos = jnp.exp(jnp.sum(z1 * z2, axis=1) / temperature)
    denom1 = jnp.sum(exp_sim[:b], axis=1)
    denom2 = jnp.sum(exp_sim[b:], axis=1)
    loss = -jnp.log(pos / denom1) - jnp.log(pos / denom2)
    return jnp.mean(loss)
