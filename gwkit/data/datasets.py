"""Device-resident injection datasets.

Functional equivalents of the reference's dataset classes (SURVEY.md §2.4):

* :class:`InjectionDataset` — BinaryGWDataset parity (MLGWSC-1/train.py:221-297):
  [N, D, T] noises, [M, D, T] waveforms (M <= N); index i < M yields
  ``noise_i + U(snr_lo, snr_hi) * waveform_i`` with one-hot label [1, 0],
  index >= M yields pure noise with label [0, 1]. HDF5 save/load with
  ``training``/``validation`` groups holding ``waveforms``/``noises``.
* :func:`sample_pretrain_pairs` — PretrainDataset parity (train.py:300-351):
  with prob 1-p two independently-noised views of the same waveform, with
  prob p two pure-noise draws.
* :class:`PartitionedDataset` — Efficiency_test BaseDataset semantics
  (tools.py:16-104): index ranges partition signal+noise vs pure-noise pools,
  with a runtime-settable SNR range (curriculum / efficiency sweeps).

Mixing happens on device inside the jit step; the SNR range is a traced
scalar pair so curriculum stepping and per-SNR efficiency sweeps reuse one
compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

WAVE_LABEL = np.array([1.0, 0.0], dtype=np.float32)
NOISE_LABEL = np.array([0.0, 1.0], dtype=np.float32)


@dataclasses.dataclass
class InjectionDataset:
    """noises [N, D, T], waveforms [M, D, T]; first M indices are injections."""

    noises: jnp.ndarray
    waveforms: jnp.ndarray
    snr_range: Tuple[float, float] = (5.0, 15.0)

    def __post_init__(self):
        self.noises = jnp.asarray(self.noises, jnp.float32)
        self.waveforms = jnp.asarray(self.waveforms, jnp.float32)
        assert self.noises.shape[1:] == self.waveforms.shape[1:]
        assert len(self.waveforms) <= len(self.noises)

    def __len__(self) -> int:
        return len(self.noises)

    @property
    def n_waveforms(self) -> int:
        return len(self.waveforms)

    def snrs(self, *args):
        """Get/set the SNR range (Efficiency_test tools.py:79-88 API)."""
        if len(args) == 0:
            return self.snr_range
        self.snr_range = tuple(args[0]) if len(args) == 1 else (args[0], args[1])

    def sample_batch(self, key, indices: jnp.ndarray):
        """Gather + mix a batch on device: returns (x [B,D,T], y [B,2], snr [B])."""
        return _mix_batch(
            self.noises, self.waveforms, indices,
            jnp.float32(self.snr_range[0]), jnp.float32(self.snr_range[1]), key,
        )

    def batches(
        self, key, batch_size: int, shuffle: bool = True, drop_remainder: bool = True
    ) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """One epoch of device batches (host-side index shuffling only)."""
        n = len(self)
        order = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1))).permutation(n) \
            if shuffle else np.arange(n)
        n_batches = n // batch_size if drop_remainder else -(-n // batch_size)
        for b in range(n_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            if len(idx) < batch_size:
                idx = np.pad(idx, (0, batch_size - len(idx)), mode="wrap")
            key, sub = jax.random.split(key)
            yield self.sample_batch(sub, jnp.asarray(idx))

    # ---- HDF5 parity (MLGWSC-1/train.py:283-297) ----
    def save(self, h5file: h5py.File, group_name: str) -> None:
        if group_name in h5file:
            raise IOError(f"Group '{group_name}' already exists.")
        g = h5file.create_group(group_name)
        g.create_dataset("waveforms", data=np.asarray(self.waveforms))
        g.create_dataset("noises", data=np.asarray(self.noises))

    @classmethod
    def load(cls, h5file: h5py.File, group_name: str, snr_range=(5.0, 15.0)) -> "InjectionDataset":
        if group_name not in h5file:
            raise IOError(f"Group '{group_name}' not found.")
        g = h5file[group_name]
        return cls(noises=g["noises"][()], waveforms=g["waveforms"][()], snr_range=snr_range)


@jax.jit
def _mix_batch(noises, waveforms, indices, snr_lo, snr_hi, key):
    m = waveforms.shape[0]
    noise = jnp.take(noises, indices, axis=0)
    if m == 0:  # noise-only dataset (e.g. efficiency FAP-threshold scoring)
        b = indices.shape[0]
        y = jnp.broadcast_to(jnp.asarray(NOISE_LABEL), (b, 2))
        return noise, y, jnp.zeros((b,), jnp.float32)
    wave_idx = jnp.minimum(indices, m - 1)
    wave = jnp.take(waveforms, wave_idx, axis=0)
    is_wave = (indices < m)[:, None, None]
    snr = jax.random.uniform(key, (indices.shape[0],), minval=snr_lo, maxval=snr_hi)
    x = noise + jnp.where(is_wave, snr[:, None, None] * wave, 0.0)
    y = jnp.where(is_wave[:, :, 0], jnp.asarray(WAVE_LABEL), jnp.asarray(NOISE_LABEL))
    return x, y, jnp.where(is_wave[:, 0, 0], snr, 0.0)


def concat_datasets(datasets, snr_range=(5.0, 15.0)) -> InjectionDataset:
    """ConcatDataset equivalent for InjectionDatasets (load_concat_datasets,
    MLGWSC-1/train.py:744-773). NOTE: the reference's index convention (first
    n_waveforms of each file are injections) is preserved by re-packing all
    injection rows first."""
    noises_inj, waves, noises_pure = [], [], []
    for ds in datasets:
        m = ds.n_waveforms
        noises_inj.append(np.asarray(ds.noises[:m]))
        waves.append(np.asarray(ds.waveforms))
        noises_pure.append(np.asarray(ds.noises[m:]))
    noises = np.concatenate(noises_inj + noises_pure, axis=0)
    waveforms = np.concatenate(waves, axis=0)
    return InjectionDataset(noises=noises, waveforms=waveforms, snr_range=snr_range)


def load_concat_datasets(paths, snr_range=(5.0, 15.0)):
    """Load every HDF5 file and return (train, valid) concatenated datasets."""
    trains, valids = [], []
    for path in paths:
        with h5py.File(path, "r") as f:
            trains.append(InjectionDataset.load(f, "training", snr_range))
            valids.append(InjectionDataset.load(f, "validation", snr_range))
    return concat_datasets(trains, snr_range), concat_datasets(valids, snr_range)


def sample_pretrain_pairs(
    key,
    noises: jnp.ndarray,
    waveforms: jnp.ndarray,
    batch_indices: jnp.ndarray,
    snr_range: Tuple[float, float] = (5.0, 15.0),
    noise_only_prob: float = 0.25,
):
    """InfoNCE pair sampling (PretrainDataset, MLGWSC-1/train.py:342-351).

    Returns (X1, X2), each [B, D, T]: same waveform + two independent noises
    with prob 1-p, or two pure-noise draws with prob p.
    """
    b = batch_indices.shape[0]
    n = noises.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n1 = jnp.take(noises, jax.random.randint(k1, (b,), 0, n), axis=0)
    n2 = jnp.take(noises, jax.random.randint(k2, (b,), 0, n), axis=0)
    wave = jnp.take(waveforms, batch_indices, axis=0)
    snr = jax.random.uniform(k3, (b, 1, 1), minval=snr_range[0], maxval=snr_range[1])
    noise_only = (jax.random.uniform(k4, (b, 1, 1)) < noise_only_prob)
    scaled = jnp.where(noise_only, 0.0, snr) * wave
    return n1 + scaled, n2 + scaled


@dataclasses.dataclass
class PartitionedDataset:
    """Efficiency_test BaseDataset/ResampledDataset semantics (tools.py:16-104).

    Index layout: the first (wave_hi-wave_lo)*noises_per_signal entries are
    injections pairing waveform (idx//nps + wave_lo) with noise
    (idx + comb_lo); the rest are pure noise from [pure_lo, pure_hi).
    SNR range is runtime-settable via .snrs() for curriculum / efficiency sweeps.
    """

    waveforms: jnp.ndarray  # [Nw, T] or [Nw, D, T]
    noises: jnp.ndarray
    snr_range: Tuple[float, float]
    wave_limits: Tuple[int, int]
    noise_combined_limits: Tuple[int, int]
    noise_pure_limits: Tuple[int, int]
    noises_per_signal: int = 1

    def __post_init__(self):
        self.waveforms = jnp.asarray(self.waveforms, jnp.float32)
        self.noises = jnp.asarray(self.noises, jnp.float32)
        self.signal_samples = (self.wave_limits[1] - self.wave_limits[0]) * self.noises_per_signal
        assert self.signal_samples == self.noise_combined_limits[1] - self.noise_combined_limits[0]

    def __len__(self) -> int:
        return self.signal_samples + (self.noise_pure_limits[1] - self.noise_pure_limits[0])

    def snrs(self, *args):
        if len(args) == 0:
            return self.snr_range
        self.snr_range = tuple(args[0]) if len(args) == 1 else (args[0], args[1])

    def sample_batch(self, key, indices: jnp.ndarray):
        """Returns (x, y, snr); x has the waveform tensors' trailing shape."""
        nw = self.waveforms.shape[0]
        nn = self.noises.shape[0]
        is_wave = indices < self.signal_samples
        wave_idx = jnp.clip(indices // self.noises_per_signal + self.wave_limits[0], 0, nw - 1)
        noise_idx = jnp.where(
            is_wave,
            jnp.clip(indices + self.noise_combined_limits[0], 0, nn - 1),
            jnp.clip(indices - self.signal_samples + self.noise_pure_limits[0], 0, nn - 1),
        )
        noise = jnp.take(self.noises, noise_idx, axis=0)
        wave = jnp.take(self.waveforms, wave_idx, axis=0)
        snr = jax.random.uniform(
            key, (indices.shape[0],), minval=self.snr_range[0], maxval=self.snr_range[1]
        )
        expand = (...,) + (None,) * (noise.ndim - 1)
        x = noise + jnp.where(is_wave[expand], snr[expand] * wave, 0.0)
        y = jnp.where(is_wave[:, None], jnp.asarray(WAVE_LABEL), jnp.asarray(NOISE_LABEL))
        return x, y, jnp.where(is_wave, snr, 0.0)
