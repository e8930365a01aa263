"""PRNG helpers: seeded determinism for every stochastic component.

The reference seeds numpy/torch globally (MLGWSC-1/train.py:52-64); here
randomness is explicit — every sampler takes a jax PRNG key.
"""
from __future__ import annotations

import jax


def key_seq(seed_or_key):
    """Infinite generator of fresh PRNG keys from a seed or key."""
    key = jax.random.PRNGKey(seed_or_key) if isinstance(seed_or_key, int) else seed_or_key
    while True:
        key, sub = jax.random.split(key)
        yield sub
