"""Gaussian noise synthesis from PSDs, batched on device.

Replaces bnslib's NoiseGenerator/WhiteNoiseGenerator (bnslib.py:1588-1748)
and the pycbc ``colored_noise`` path of the challenge generator
(MLGWSC-1/generate_data.py:404-434). The reference fans generation out over
multiprocessing pools; here one jit'd batched irfft does the whole table,
with seeded jax PRNG keys for reproducibility and chunked generation for
hour-scale streams (1-hour chunks like generate_data.py, bounded memory).

Colored-noise recipe: one-sided PSD S_k, N samples at delta_t -> complex
spectrum Z_k = (a_k + i b_k) * sqrt(S_k * N / (4 delta_t)), a,b ~ N(0,1);
x = irfft(Z). Then E[PSD(x)] = S. (DC/Nyquist real.)
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(1, 2))
def colored_noise(key, n: int, delta_t: float, psd: jnp.ndarray) -> jnp.ndarray:
    """One realization per leading PSD batch dim: psd (..., N//2+1) -> (..., N).

    PSDs must be pre-normalized to a representable f32 scale (see
    gwkit.ops.whiten note on strain-scale dynamics); to generate physical
    1e-21 strain, generate with psd/c and multiply by sqrt(c) host-side.
    """
    flen = n // 2 + 1
    shape = psd.shape[:-1] + (flen,)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, shape)
    b = jax.random.normal(k2, shape)
    amp = jnp.sqrt(psd * n / (4.0 * delta_t))
    z = (a + 1j * b) * amp
    z = z.at[..., 0].set(0.0)
    z = z.at[..., -1].set(a[..., -1] * jnp.sqrt(psd[..., -1] * n / (2.0 * delta_t)))
    return jnp.fft.irfft(z, n, axis=-1)


class NoiseGenerator:
    """Chunked, seeded colored-noise generation (bnslib.py:1588-1705 surface).

    ``get(n_samples, duration)`` returns (n_samples, N) noise at the given
    sample rate from the named/provided PSD; generation is chunked along the
    batch axis to bound device memory.
    """

    def __init__(
        self,
        psd: "str | np.ndarray" = "aLIGOZeroDetHighPower",
        sample_rate: float = 2048.0,
        low_freq_cutoff: float = 15.0,
        seed: int = 0,
        chunk_samples: int = 256,
    ):
        self.psd_spec = psd
        self.sample_rate = sample_rate
        self.low_freq_cutoff = low_freq_cutoff
        self.seed = seed
        self.chunk_samples = chunk_samples

    def _psd(self, n: int) -> tuple[jnp.ndarray, float]:
        from gwkit.ops.psd import get_psd

        flen = n // 2 + 1
        delta_f = self.sample_rate / n
        if isinstance(self.psd_spec, str):
            psd = get_psd(self.psd_spec, flen, delta_f, self.low_freq_cutoff)
        else:
            psd = np.asarray(self.psd_spec)
        pos = psd > 0
        c = float(psd[pos].mean()) if pos.any() else 1.0
        return jnp.asarray((psd / c).astype(np.float32)), c

    def get(self, n_samples: int, duration: float) -> np.ndarray:
        n = int(round(duration * self.sample_rate))
        psd_n, c = self._psd(n)
        out = np.empty((n_samples, n), np.float32)
        key = jax.random.PRNGKey(self.seed)
        scale = np.sqrt(c)
        for s in range(0, n_samples, self.chunk_samples):
            e = min(s + self.chunk_samples, n_samples)
            key, sub = jax.random.split(key)
            batch_psd = jnp.broadcast_to(psd_n, (e - s, psd_n.shape[-1]))
            chunk = colored_noise(sub, n, 1.0 / self.sample_rate, batch_psd)
            out[s:e] = np.asarray(chunk) * scale
        return out

    def stream(self, total_duration: float, chunk_duration: float = 3600.0) -> np.ndarray:
        """Hour-chunked continuous noise (generate_data.py:404-434 semantics).

        NB: like the reference, chunks are generated independently — chunk
        boundaries are not phase-continuous (irrelevant after whitening)."""
        chunks = []
        remaining = total_duration
        key = jax.random.PRNGKey(self.seed)
        while remaining > 0:
            dur = min(chunk_duration, remaining)
            n = int(round(dur * self.sample_rate))
            psd_n, c = self._psd(n)
            key, sub = jax.random.split(key)
            chunks.append(np.asarray(colored_noise(sub, n, 1.0 / self.sample_rate, psd_n)) * np.sqrt(c))
            remaining -= dur
        return np.concatenate(chunks, axis=-1)


class WhiteNoiseGenerator:
    """Unit-variance white Gaussian noise (bnslib.py:1707-1748 surface)."""

    def __init__(self, sample_rate: float = 2048.0, seed: int = 0, sigma: float = 1.0):
        self.sample_rate = sample_rate
        self.seed = seed
        self.sigma = sigma

    def get(self, n_samples: int, duration: float) -> np.ndarray:
        n = int(round(duration * self.sample_rate))
        key = jax.random.PRNGKey(self.seed)
        return np.asarray(jax.random.normal(key, (n_samples, n)) * self.sigma, np.float32)
