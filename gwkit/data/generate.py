"""Dataset generation: MLGWSC-1 challenge files + training corpora.

Covers the reference's Layer-1 generators (SURVEY.md §2.8) without the
pycbc/lalsuite dependency:

* :func:`generate_challenge_data` — MLGWSC-1/generate_data.py: segmented
  colored noise per detector over an O3a-style segment list (datasets 1-3;
  dataset 4's real-noise download is out of scope in a zero-egress build),
  an injection table on a 24 s grid (chirp-distance-uniform sources), the
  injections projected and added -> foreground/background/injection HDF5
  files in the exact challenge layout.
* :func:`generate_training_set` — MLGWSC-1/gen.py:116-229: 1 s two-detector
  windows of whitened noise and unit-network-SNR whitened waveforms, saved
  as 'training'/'validation' groups with 'waveforms'/'noises' datasets
  (BinaryGWDataset layout).

Numerics note: all internal generation happens in "normalized strain units"
(PSD scaled to O(1) by its in-band mean c); physical strain is recovered by
sqrt(c) on the host. SNR is invariant under this joint rescaling.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from gwkit.data.detector import antenna_pattern, time_delay_from_earth_center
from gwkit.data.noise import colored_noise
from gwkit.data.segments import default_o3a_segments, restrict_segments
from gwkit.data.waveforms import SourceDistribution, td_polarizations
from gwkit.ops.psd import get_psd
from gwkit.ops.snr import network_snr, optimal_snr
from gwkit.ops.whiten import whiten_psd

DETECTORS = ("H1", "L1")


def _normalized_psd(psd_name: str, n: int, sample_rate: float, f_low: float):
    psd = get_psd(psd_name, n // 2 + 1, sample_rate / n, f_low)
    pos = psd > 0
    c = float(psd[pos].mean()) if pos.any() else 1.0
    return jnp.asarray((psd / c).astype(np.float32)), c


def make_injection_table(
    seed: int,
    segments: Sequence[Tuple[float, float]],
    time_step: float = 24.0,
    jitter: float = 6.0,
    distribution: SourceDistribution = SourceDistribution(),
    padding: float = 30.0,
) -> Dict[str, np.ndarray]:
    """Injection times on a time_step grid (uniform jitter in a `jitter`
    window) inside the segments, + source parameters
    (generate_data.py:574-638 / ds ini semantics)."""
    rng = np.random.default_rng(seed)
    tcs = []
    for start, end in segments:
        t = start + padding
        while t + time_step < end - padding:
            tcs.append(t + rng.uniform(0, jitter))
            t += time_step
    tcs = np.asarray(tcs)
    params = distribution.sample(rng, len(tcs))
    params["tc"] = tcs.astype(np.float64)
    return params


def _project_injection_batch(
    params: Dict[str, np.ndarray],
    sl: slice,
    wave_duration: float,
    sample_rate: float,
    f_lower: float,
    scale: float,
    detectors: Sequence[str],
    tc_frac: float = 0.75,
    approximant: str = "imrphenomd",
) -> np.ndarray:
    """(B, D, N) detector strains of injections sl, coalescence at the
    window's 3/4 point (normalized units via `scale`)."""
    sub = {k: v[sl] for k, v in params.items()}
    tc_in_window = tc_frac * wave_duration
    hp, hc = td_polarizations(
        {**sub, "tc": np.full(len(sub["mass1"]), tc_in_window)},
        wave_duration, sample_rate, f_lower, approximant=approximant,
    )
    hp = np.asarray(hp) * scale
    hc = np.asarray(hc) * scale
    outs = []
    for det in detectors:
        fp, fc = antenna_pattern(det, sub["ra"], sub["dec"], sub["polarization"], sub["tc"])
        delay = time_delay_from_earth_center(det, sub["ra"], sub["dec"], sub["tc"])
        h = fp[:, None] * hp + fc[:, None] * hc
        shift = np.round(delay * sample_rate).astype(int)
        h = np.stack([np.roll(row, s) for row, s in zip(h, shift)])
        outs.append(h)
    return np.stack(outs, axis=1)


def generate_challenge_data(
    foreground_path: str,
    background_path: str,
    injection_path: str,
    duration: float = 86400.0,
    sample_rate: float = 2048.0,
    seed: int = 42,
    psd_names: Optional[Dict[str, str]] = None,
    detectors: Sequence[str] = DETECTORS,
    f_lower: float = 20.0,
    segments: Optional[List[Tuple[float, float]]] = None,
    distribution: SourceDistribution = SourceDistribution(),
    wave_duration: float = 64.0,
    inject_batch: int = 64,
) -> Dict[str, np.ndarray]:
    """Write background (noise), foreground (noise+injections), and
    injection-table HDF5 files in the MLGWSC-1 layout."""
    psd_names = psd_names or {det: "aLIGOZeroDetHighPower" for det in detectors}
    spans = segments or restrict_segments(default_o3a_segments(), duration)
    params = make_injection_table(seed, spans, distribution=distribution)
    logging.info("%d segments, %d injections", len(spans), len(params["tc"]))

    key = jax.random.PRNGKey(seed)
    n_wave = int(wave_duration * sample_rate)
    with h5py.File(background_path, "w") as bg, h5py.File(foreground_path, "w") as fg:
        for det in detectors:
            bg.create_group(det)
            fg.create_group(det)
        # Hour-scale segments are synthesized in fixed 2^19-sample (256 s)
        # chunks: one power-of-two FFT compiled once, bounded device memory
        # (the reference chunks at 1 h for the same reason,
        # generate_data.py:404-434; chunk boundaries are not phase-continuous
        # there either). The last chunk is generated full and trimmed.
        n_chunk = 1 << 19
        psd_chunk = {}
        for det in detectors:
            psd_chunk[det] = _normalized_psd(psd_names[det], n_chunk, sample_rate, f_lower - 2.0)
        for si, (start, end) in enumerate(spans):
            n = int(round((end - start) * sample_rate))
            seg_noise = {}
            for det in detectors:
                psd_n, c = psd_chunk[det]
                rows = []
                remaining = n
                while remaining > 0:
                    key, sub = jax.random.split(key)
                    chunk = np.asarray(colored_noise(sub, n_chunk, 1.0 / sample_rate, psd_n))
                    rows.append(chunk[: min(n_chunk, remaining)])
                    remaining -= n_chunk
                seg_noise[det] = (np.concatenate(rows) * np.sqrt(c)).astype(np.float32)
            # injections falling in this segment
            mask = (params["tc"] >= start) & (params["tc"] < end)
            idxs = np.flatnonzero(mask)
            fg_noise = {det: seg_noise[det].copy() for det in detectors}
            for bstart in range(0, len(idxs), inject_batch):
                blk = idxs[bstart : bstart + inject_batch]
                strains = _project_injection_batch(
                    params, blk, wave_duration, sample_rate, f_lower, 1.0, detectors,
                    approximant=distribution.approximant,
                )
                for bi, gi in enumerate(blk):
                    # coalescence sits 3/4 into the waveform window
                    t0 = params["tc"][gi] - 0.75 * wave_duration
                    s = int(round((t0 - start) * sample_rate))
                    e = s + n_wave
                    ws, we = max(0, -s), n_wave - max(0, e - n)
                    s, e = max(s, 0), min(e, n)
                    if s >= e:
                        continue
                    for di, det in enumerate(detectors):
                        fg_noise[det][s:e] += strains[bi, di][ws:we]
            for det in detectors:
                for arr, f in ((seg_noise, bg), (fg_noise, fg)):
                    ds = f[det].create_dataset(str(si), data=arr[det])
                    ds.attrs["start_time"] = start
                    ds.attrs["delta_t"] = 1.0 / sample_rate
    with h5py.File(injection_path, "w") as inj:
        for k, v in params.items():
            inj.create_dataset(k, data=v)
    return params


def generate_training_set(
    output_path: str,
    n_train: int = 1000,
    n_valid: int = 200,
    waveform_fraction: float = 0.5,
    sample_rate: float = 2048.0,
    window_duration: float = 1.0,
    seed: int = 0,
    psd_name: str = "aLIGOZeroDetHighPower",
    detectors: Sequence[str] = DETECTORS,
    f_lower: float = 20.0,
    wave_duration: float = 16.0,
    distribution: SourceDistribution = SourceDistribution(),
) -> None:
    """MLGWSC-1/gen.py parity: per split, [N, D, T] whitened unit-network-SNR
    waveform windows + [M, D, T] whitened noise windows (M >= N), saved as
    'training'/'validation' groups. Everything in normalized strain units
    (the training pipeline is scale-free after whitening)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    n_window = int(window_duration * sample_rate)
    n_wave = int(wave_duration * sample_rate)
    psd_wave_n, c_wave = _normalized_psd(psd_name, n_wave, sample_rate, f_lower - 2.0)
    # noise windows generated long enough to survive the whitening crop
    max_filter_duration = 0.5
    pad = int(max_filter_duration * sample_rate)
    n_noise_gen = n_window + 2 * pad
    psd_noise_n, _ = _normalized_psd(psd_name, n_noise_gen, sample_rate, f_lower - 2.0)

    with h5py.File(output_path, "w") as f:
        for group, count in (("training", n_train), ("validation", n_valid)):
            n_waves = int(count * waveform_fraction)
            params = distribution.sample(rng, n_waves)
            params["tc"] = np.full(n_waves, 0.75 * wave_duration)
            waves = []
            # whitening crops max_filter_len from both ends; keep the filter
            # short enough that the tc-centered window survives the crop
            mfl_dur = min(4.0, wave_duration / 4.0)
            mfl = int(mfl_dur * sample_rate)
            tc_frac = 0.5
            for s in range(0, n_waves, 64):
                sl = slice(s, min(s + 64, n_waves))
                # normalized strain units h/sqrt(c): SNR is invariant under the
                # joint (h/sqrt(c), S/c) rescaling, so optimal_snr against the
                # normalized PSD is the physical SNR
                strains = _project_injection_batch(
                    params, sl, wave_duration, sample_rate, f_lower,
                    1.0 / np.sqrt(c_wave), detectors, tc_frac=tc_frac,
                    approximant=distribution.approximant,
                )
                batch = jnp.asarray(strains)
                snrs = optimal_snr(batch, psd_wave_n, 1.0 / sample_rate, f_lower)  # (B, D)
                net = network_snr(snrs, axis=-1)
                batch = batch / jnp.maximum(net, 1e-12)[:, None, None]
                white = whiten_psd(
                    batch.reshape(-1, n_wave), psd_wave_n, 1.0 / sample_rate,
                    low_freq_cutoff=f_lower, max_filter_duration=mfl_dur,
                )
                white = np.asarray(white).reshape(batch.shape[0], len(detectors), -1)
                # place tc at the window's 0.7 point (Efficiency_test tc_mean)
                center = int(tc_frac * wave_duration * sample_rate) - mfl
                tc_pos = int(0.7 * n_window)
                s0 = max(0, min(center - tc_pos, white.shape[-1] - n_window))
                waves.append(white[:, :, s0 : s0 + n_window])
            waveforms = np.concatenate(waves) if waves else np.zeros((0, len(detectors), n_window), np.float32)

            noise_rows = []
            for s in range(0, count, 128):
                b = min(128, count - s)
                key, sub = jax.random.split(key)
                batch_psd = jnp.broadcast_to(psd_noise_n, (b, len(detectors), psd_noise_n.shape[-1]))
                noise = colored_noise(sub, n_noise_gen, 1.0 / sample_rate, batch_psd)
                white = whiten_psd(
                    noise.reshape(-1, n_noise_gen), psd_noise_n, 1.0 / sample_rate,
                    low_freq_cutoff=f_lower, max_filter_duration=max_filter_duration,
                )
                white = np.asarray(white).reshape(b, len(detectors), -1)
                noise_rows.append(white[:, :, :n_window])
            noises = np.concatenate(noise_rows)

            g = f.create_group(group)
            g.create_dataset("waveforms", data=waveforms.astype(np.float32))
            g.create_dataset("noises", data=noises.astype(np.float32))
            logging.info("%s: %d waveforms, %d noises", group, len(waveforms), len(noises))
