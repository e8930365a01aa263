"""Dataset generation: MLGWSC-1 challenge files + training corpora.

Covers the reference's Layer-1 generators (SURVEY.md §2.8) without the
pycbc/lalsuite dependency:

* :func:`generate_challenge_data` — MLGWSC-1/generate_data.py: all four
  challenge datasets. 1-3: segmented colored noise per detector over an
  O3a-style segment list with per-dataset PSD selection
  (generate_data.py:355-372 — ds1 fixed design PSD, ds2 one random PSD
  variant per detector per run, ds3 a fresh variant per segment); 4: real
  noise read from a *local* file in the challenge layout with
  inter-detector time slides (generate_data.py:218-329; the AEI download
  itself is impossible zero-egress — `write_real_noise_file` documents and
  produces the expected layout). Injection table on a 24 s grid with the
  per-dataset spin populations (ds1 non-spinning, ds2 aligned
  U(-0.99,0.99), ds3/4 isotropic magnitude U(0,0.99), IMRPhenomD),
  projected and added -> foreground/background/injection HDF5 files in the
  exact challenge layout.
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
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from gwkit.data.detector import antenna_pattern, time_delay_from_earth_center
from gwkit.data.noise import colored_noise
from gwkit.data.segments import (
    DetectorData,
    OverlapSegment,
    default_o3a_segments,
    restrict_segments,
)
from gwkit.data.waveforms import SourceDistribution, td_polarizations
from gwkit.ops.psd import get_psd, psd_variant
from gwkit.ops.snr import network_snr, optimal_snr
from gwkit.ops.whiten import whiten_psd

DETECTORS = ("H1", "L1")


def _normalize_psd_array(psd: np.ndarray):
    pos = psd > 0
    c = float(psd[pos].mean()) if pos.any() else 1.0
    return jnp.asarray((psd / c).astype(np.float32)), c


def _normalized_psd(psd_name: str, n: int, sample_rate: float, f_low: float):
    return _normalize_psd_array(get_psd(psd_name, n // 2 + 1, sample_rate / n, f_low))


def challenge_distribution(dataset: int) -> SourceDistribution:
    """The four challenge injection populations (ds{1-4}.ini semantics:
    masses U(10,50), chirp-distance-uniform; ds1 non-spinning, ds2 aligned
    spins U(-0.99, 0.99), ds3/4 isotropic spin vectors with magnitude
    U(0, 0.99) carried through the precession twist AND the higher
    harmonics ('imrphenomxphm', gwkit.data.higher_modes.xphm_hplus_hcross)
    — mirroring the reference's IMRPhenomD-for-aligned /
    IMRPhenomXPHM-for-precessing approximant split
    (MLGWSC-1/gen.py:131-147, generate_data.py:768-771)."""
    if dataset == 1:
        return SourceDistribution()
    if dataset == 2:
        return SourceDistribution(spin_max=0.99)
    if dataset in (3, 4):
        return SourceDistribution(spin_max=0.99, isotropic_spins=True,
                                  approximant="imrphenomxphm")
    raise ValueError(f"unknown challenge dataset {dataset}")


class ChallengePSDSelector:
    """Per-dataset PSD choice (generate_data.py:355-372 semantics).

    ds1: the design PSD for every detector and segment. ds2: one variant
    per detector, fixed for the whole run. ds3: a fresh variant per
    detector per segment. Variants come from :func:`gwkit.ops.psd.
    psd_variant` (the challenge's 20 per-detector O3a PSD files are
    cluster-local paths that do not ship); real PSD files can be passed
    through ``psd_names`` instead.
    """

    N_VARIANTS = 20

    def __init__(self, dataset: int, seed: int, detectors: Sequence[str]):
        if dataset not in (1, 2, 3):
            raise ValueError("PSD selection is defined for datasets 1-3")
        self.dataset = dataset
        self._rs = np.random.default_rng(seed)
        self._fixed = {det: int(self._rs.integers(self.N_VARIANTS)) for det in detectors}

    def key_for(self, det: str, segment_index: int) -> Tuple[str, int]:
        if self.dataset == 1:
            return ("aLIGOZeroDetHighPower", 0)
        if self.dataset == 2:
            return (det, self._fixed[det])
        return (det, int(self._rs.integers(self.N_VARIANTS)))

    def psd_array(self, key: Tuple[str, int], flen: int, delta_f: float,
                  f_low: float) -> np.ndarray:
        name, idx = key
        if name == "aLIGOZeroDetHighPower":
            return get_psd(name, flen, delta_f, f_low)
        return psd_variant(flen, delta_f, f_low, detector=name, index=idx)


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


def _training_windows_batch(
    params: Dict[str, np.ndarray],
    sl: slice,
    wave_duration: float,
    sample_rate: float,
    f_lower: float,
    scale: float,
    detectors: Sequence[str],
    psd_wave_n: jnp.ndarray,
    mfl_dur: float,
    s0: int,
    n_window: int,
    tc_frac: float,
    approximant: str,
) -> np.ndarray:
    """(B, D, n_window) whitened unit-network-SNR training windows with the
    ENTIRE pipeline on device — synth (FD), detector projection as
    sub-sample FD phase delays, SNR normalization, whitening, window crop —
    so only the final 1 s windows cross the host link. The previous
    host-side projection shipped the full 16 s hp/hc batches back and forth
    (~320 MB per 512-batch), which is the wall on a tunneled TPU
    (~10 MB/s measured: 16 waveforms/s end to end; this path transfers
    ~4 MB per batch instead)."""
    sub = {k: v[sl] for k, v in params.items()}
    b = len(sub["mass1"])
    fps, fcs, dls = [], [], []
    for det in detectors:
        fp, fc = antenna_pattern(det, sub["ra"], sub["dec"], sub["polarization"], sub["tc"])
        dl = time_delay_from_earth_center(det, sub["ra"], sub["dec"], sub["tc"])
        fps.append(fp)
        fcs.append(fc)
        dls.append(dl)
    as32 = lambda k, d=0.0: jnp.asarray(sub.get(k, np.full(b, d)), jnp.float32)
    n = int(wave_duration * sample_rate)
    out = _training_windows_jit(
        n, 1.0 / sample_rate, f_lower, approximant, mfl_dur, s0, n_window,
        float(tc_frac * wave_duration),
        as32("mass1"), as32("mass2"), as32("distance"), as32("inclination"),
        as32("coa_phase"), as32("spin1z"), as32("spin2z"),
        as32("chi_p"), as32("alpha0"),
        jnp.asarray(np.stack(fps, 1), jnp.float32),
        jnp.asarray(np.stack(fcs, 1), jnp.float32),
        jnp.asarray(np.stack(dls, 1), jnp.float32),
        psd_wave_n, jnp.float32(scale),
        as32("spin1x"), as32("spin1y"), as32("spin2x"), as32("spin2y"),
    )
    return np.asarray(out)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _training_windows_jit(
    n, delta_t, f_lower, approximant, mfl_dur, s0, n_window, tc_in_window,
    m1, m2, dist, incl, phic, c1, c2, chip, a0, fp, fc, delay, psd_n, scale,
    s1x, s1y, s2x, s2y,
):
    from gwkit.data.waveforms import fd_polarizations_switch

    delta_f = 1.0 / (n * delta_t)
    freqs = jnp.arange(n // 2 + 1) * delta_f

    def one(m1i, m2i, di, ii, pci, c1i, c2i, cpi, a0i, fpi, fci, dli,
            s1xi, s1yi, s2xi, s2yi):
        hp, hc = fd_polarizations_switch(
            freqs, approximant, f_lower, m1i, m2i, di, ii, tc_in_window,
            pci, c1i, c2i, cpi, a0i, s1xi, s1yi, s2xi, s2yi)
        # sub-sample detector delay as an FD phase (replaces host np.roll)
        phase = jnp.exp(-2j * jnp.pi * freqs[None, :] * dli[:, None])  # (D, F)
        hdet = (fpi[:, None] * hp[None, :] + fci[:, None] * hc[None, :]) * phase
        return jnp.fft.irfft(hdet, n, axis=-1) / delta_t  # (D, n)

    h = jax.vmap(one)(m1, m2, dist, incl, phic, c1, c2, chip, a0, fp, fc,
                      delay, s1x, s1y, s2x, s2y)
    h = h * scale
    snrs = optimal_snr(h, psd_n, delta_t, f_lower)  # (B, D)
    net = network_snr(snrs, axis=-1)
    h = h / jnp.maximum(net, 1e-12)[:, None, None]
    white = whiten_psd(h.reshape(-1, n), psd_n, delta_t,
                       low_freq_cutoff=f_lower, max_filter_duration=mfl_dur)
    white = white.reshape(h.shape[0], -1, white.shape[-1])
    return white[:, :, s0 : s0 + n_window]


def _add_injections(
    fg_noise: Dict[str, np.ndarray],
    params: Dict[str, np.ndarray],
    start: float,
    sample_rate: float,
    wave_duration: float,
    f_lower: float,
    detectors: Sequence[str],
    approximant: str,
    inject_batch: int,
) -> None:
    """Add every injection whose tc falls inside this segment (in place)."""
    n = len(fg_noise[detectors[0]])
    n_wave = int(wave_duration * sample_rate)
    end = start + n / sample_rate
    mask = (params["tc"] >= start) & (params["tc"] < end)
    idxs = np.flatnonzero(mask)
    for bstart in range(0, len(idxs), inject_batch):
        blk = idxs[bstart : bstart + inject_batch]
        # pad the final block to inject_batch (repeat last index, outputs
        # discarded): a ragged tail batch would retrace the waveform graph
        # once per distinct remainder — ~60 extra compiles over a month of
        # segments on a relay where each compile round-trips
        padded = np.concatenate([blk, np.full(inject_batch - len(blk), blk[-1])]) \
            if len(blk) < inject_batch else blk
        strains = _project_injection_batch(
            params, padded, wave_duration, sample_rate, f_lower, 1.0, detectors,
            approximant=approximant,
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


def write_real_noise_file(
    path: str,
    duration: float = 7200.0,
    sample_rate: float = 2048.0,
    seed: int = 0,
    detectors: Sequence[str] = DETECTORS,
    segments: Optional[List[Tuple[float, float]]] = None,
    psd_name: str = "aLIGOZeroDetHighPower",
) -> List[Tuple[float, float]]:
    """Write a noise file in the challenge's real-noise layout.

    Layout (generate_data.py:197-216 `store_ts` / :303-316): one dataset
    per `{detector}/{int(start_time)}` with `start_time` and `delta_t`
    attrs. Dataset 4 generation consumes this layout; real O3a data
    exported from GWOSC drops into the same function. Here the content is
    synthesized colored noise (the AEI download is unavailable zero-egress).
    """
    spans = segments or restrict_segments(default_o3a_segments(), duration)
    key = jax.random.PRNGKey(seed)
    n_chunk = 1 << 19
    psd_n, c = _normalized_psd(psd_name, n_chunk, sample_rate, 18.0)
    with h5py.File(path, "w") as f:
        for start, end in spans:
            n = int(round((end - start) * sample_rate))
            for det in detectors:
                rows = []
                remaining = n
                while remaining > 0:
                    key, sub = jax.random.split(key)
                    chunk = np.asarray(colored_noise(sub, n_chunk, 1.0 / sample_rate, psd_n))
                    rows.append(chunk[: min(n_chunk, remaining)])
                    remaining -= n_chunk
                ds = f.create_dataset(
                    f"{det}/{int(start)}",
                    data=(np.concatenate(rows) * np.sqrt(c)).astype(np.float32))
                ds.attrs["start_time"] = float(start)
                ds.attrs["delta_t"] = 1.0 / sample_rate
    return spans


def load_real_noise_segments(
    path: str,
    duration: float,
    detectors: Sequence[str] = DETECTORS,
    slide_buffer: float = 240.0,
) -> List[OverlapSegment]:
    """Read a real-noise file (see :func:`write_real_noise_file` for the
    layout) into OverlapSegments, reserving ``slide_buffer`` seconds per
    segment for inter-detector time slides (generate_data.py:286-292)."""
    segs: List[OverlapSegment] = []
    covered = 0.0
    with h5py.File(path, "r") as f:
        starts = sorted(int(k) for k in f[detectors[0]].keys())
        for st in starts:
            if covered >= duration:
                break
            seg = OverlapSegment()
            for det in detectors:
                ds = f[f"{det}/{st}"]
                dt = float(ds.attrs["delta_t"])
                seg.add_timeseries(DetectorData(
                    detector=det, strain=ds[()],
                    start_time=float(ds.attrs["start_time"]),
                    sample_rate=1.0 / dt))
            o_start, o_end = seg.overlap
            usable = (o_end - o_start) - slide_buffer
            if usable <= 0:
                continue
            seg.duration = min(usable, duration - covered)
            covered += seg.duration
            segs.append(seg)
    if covered < duration:
        raise ValueError(
            f"real-noise file covers {covered:.0f}s < requested {duration:.0f}s")
    return segs


# Chunks fetched per device call in month-scale generation (16 MB f32 slabs);
# the key-per-chunk split order matches the unbatched path exactly.
_NOISE_CHUNK_BATCH = 8


# n AND delta_t static: colored_noise is itself jitted with
# static_argnums=(1, 2), so a traced delta_t would land in the inner jit's
# static slot (tracer-in-statics -> pytree-metadata equality error once the
# inner cache holds a concrete-float entry).
@partial(jax.jit, static_argnums=(1, 2))
def _batched_colored_noise(keys, n: int, delta_t: float, psd: jnp.ndarray):
    return jax.vmap(lambda k: colored_noise(k, n, delta_t, psd))(keys)


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
    distribution: Optional[SourceDistribution] = None,
    wave_duration: float = 64.0,
    inject_batch: int = 64,
    dataset: int = 1,
    real_noise_path: Optional[str] = None,
    slide_buffer: float = 240.0,
    resume: bool = False,
) -> Dict[str, np.ndarray]:
    """Write background (noise), foreground (noise+injections), and
    injection-table HDF5 files in the MLGWSC-1 layout for challenge
    ``dataset`` 1-4 (dataset 4 needs ``real_noise_path``; see
    :func:`write_real_noise_file` for its layout).

    ``resume=True`` opens the fg/bg files in append mode and skips segments
    whose four datasets (bg/fg x detectors) are already complete, replaying
    the PRNG key-split order for the skipped noise so the remaining segments
    are bit-identical to an uninterrupted run. Month-scale generation is a
    multi-hour device job on a tunneled TPU; a crash or relay stall must not
    cost the finished segments (the injection file is still written last and
    is the overall completion marker)."""
    distribution = distribution or challenge_distribution(dataset)
    rng = np.random.default_rng(seed)

    if dataset == 4:
        if real_noise_path is None:
            raise ValueError("dataset 4 requires real_noise_path")
        real_segs = load_real_noise_segments(
            real_noise_path, duration, detectors, slide_buffer)
        shifted = [seg.get(shift=True, rng=rng) for seg in real_segs]
        spans = [(st, st + arr.shape[-1] / sample_rate) for st, arr in shifted]
    else:
        if psd_names:
            selector = None
        else:
            selector = ChallengePSDSelector(dataset, seed, detectors)
        spans = segments or restrict_segments(default_o3a_segments(), duration)

    params = make_injection_table(seed, spans, distribution=distribution)
    logging.info("dataset %d: %d segments, %d injections",
                 dataset, len(spans), len(params["tc"]))

    key = jax.random.PRNGKey(seed)
    mode = "a" if resume else "w"
    with h5py.File(background_path, mode) as bg, h5py.File(foreground_path, mode) as fg:
        for det in detectors:
            bg.require_group(det)
            fg.require_group(det)
        # Hour-scale segments are synthesized in fixed 2^19-sample (256 s)
        # chunks: one power-of-two FFT compiled once, bounded device memory
        # (the reference chunks at 1 h for the same reason,
        # generate_data.py:404-434; chunk boundaries are not phase-continuous
        # there either). The last chunk is generated full and trimmed.
        n_chunk = 1 << 19
        psd_cache: Dict[Tuple[str, int], Tuple[jnp.ndarray, float]] = {}
        for si, (start, end) in enumerate(spans):
            n = int(round((end - start) * sample_rate))
            name = str(si)
            if resume:
                have = [f[det].get(name) for f in (bg, fg) for det in detectors]
                if all(d is not None and d.shape[0] == n for d in have):
                    # replay the noise key splits so later segments match an
                    # uninterrupted run bit-for-bit
                    if dataset != 4:
                        n_chunks = -(-n // n_chunk)
                        for _ in detectors:
                            for _ in range(n_chunks):
                                key, _unused = jax.random.split(key)
                    continue
                for f in (bg, fg):  # drop any partial write of this segment
                    for det in detectors:
                        if name in f[det]:
                            del f[det][name]
            seg_noise = {}
            if dataset == 4:
                st, arr = shifted[si]
                for di, det in enumerate(detectors):
                    seg_noise[det] = arr[di][:n].astype(np.float32)
            else:
                for det in detectors:
                    if psd_names:
                        psd_n, c = psd_cache.setdefault(
                            (psd_names[det], 0),
                            _normalized_psd(psd_names[det], n_chunk, sample_rate,
                                            f_lower - 2.0))
                    else:
                        pkey = selector.key_for(det, si)
                        if pkey not in psd_cache:
                            psd_cache[pkey] = _normalize_psd_array(
                                selector.psd_array(pkey, n_chunk // 2 + 1,
                                                   sample_rate / n_chunk,
                                                   f_lower - 2.0))
                        psd_n, c = psd_cache[pkey]
                    # One device call per BATCH of 256 s chunks, not per chunk:
                    # month-scale generation is dominated by per-call dispatch +
                    # transfer latency on the tunneled TPU relay (~40k serial
                    # 2 MB round trips for 30 days), so chunks are generated
                    # vmapped over their per-chunk keys and fetched in ~16 MB
                    # slabs. The key-split order is IDENTICAL to the unbatched
                    # path; single-chunk segments keep the original call shape
                    # (golden e2e bit-compatibility).
                    n_chunks = -(-n // n_chunk)
                    subs = []
                    for _ in range(n_chunks):
                        key, sub = jax.random.split(key)
                        subs.append(sub)
                    if n_chunks == 1:
                        rows = [np.asarray(colored_noise(
                            subs[0], n_chunk, 1.0 / sample_rate, psd_n))[:n]]
                    else:
                        rows = []
                        for off in range(0, n_chunks, _NOISE_CHUNK_BATCH):
                            batch_keys = jnp.stack(subs[off:off + _NOISE_CHUNK_BATCH])
                            slab = np.asarray(_batched_colored_noise(
                                batch_keys, n_chunk, 1.0 / sample_rate, psd_n))
                            rows.append(slab.reshape(-1)[: n - off * n_chunk])
                    seg_noise[det] = (np.concatenate(rows) * np.sqrt(c)).astype(np.float32)
            fg_noise = {det: seg_noise[det].copy() for det in detectors}
            _add_injections(fg_noise, params, start, sample_rate, wave_duration,
                            f_lower, detectors, distribution.approximant, inject_batch)
            for det in detectors:
                for arr, f in ((seg_noise, bg), (fg_noise, fg)):
                    ds = f[det].create_dataset(str(si), data=arr[det])
                    ds.attrs["start_time"] = start
                    ds.attrs["delta_t"] = 1.0 / sample_rate
    with h5py.File(injection_path, "w") as inj:
        for k, v in params.items():
            inj.create_dataset(k, data=v)
        inj.attrs["dataset"] = dataset
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

    tmp_path = output_path + ".tmp"
    with h5py.File(tmp_path, "w") as f:
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
            # batch 512 (not 64): at reference scale (100k+ waveforms) the
            # per-dispatch RPC on a tunneled TPU dominates small batches
            wave_batch = 512
            t_start = time.time()
            # place tc at the window's 0.7 point (Efficiency_test tc_mean)
            center = int(tc_frac * wave_duration * sample_rate) - mfl
            tc_pos = int(0.7 * n_window)
            n_white = n_wave - 2 * mfl
            s0 = max(0, min(center - tc_pos, n_white - n_window))
            for s in range(0, n_waves, wave_batch):
                sl = slice(s, min(s + wave_batch, n_waves))
                if s and (s // wave_batch) % 20 == 0:
                    rate = s / max(time.time() - t_start, 1e-9)
                    logging.info("%s waveforms: %d/%d (%.0f/s)", group, s, n_waves, rate)
                # normalized strain units h/sqrt(c): SNR is invariant under the
                # joint (h/sqrt(c), S/c) rescaling, so optimal_snr against the
                # normalized PSD is the physical SNR. Everything device-side;
                # only the (B, D, n_window) result crosses the host link.
                waves.append(_training_windows_batch(
                    params, sl, wave_duration, sample_rate, f_lower,
                    1.0 / np.sqrt(c_wave), detectors, psd_wave_n,
                    mfl_dur, s0, n_window, tc_frac,
                    distribution.approximant,
                ))
            waveforms = np.concatenate(waves) if waves else np.zeros((0, len(detectors), n_window), np.float32)

            noise_rows = []
            noise_batch = 1024
            for s in range(0, count, noise_batch):
                b = min(noise_batch, count - s)
                key, sub = jax.random.split(key)
                batch_psd = jnp.broadcast_to(psd_noise_n, (b, len(detectors), psd_noise_n.shape[-1]))
                noise = colored_noise(sub, n_noise_gen, 1.0 / sample_rate, batch_psd)
                white = whiten_psd(
                    noise.reshape(-1, n_noise_gen), psd_noise_n, 1.0 / sample_rate,
                    low_freq_cutoff=f_lower, max_filter_duration=max_filter_duration,
                )
                white = white.reshape(b, len(detectors), -1)[:, :, :n_window]
                noise_rows.append(np.asarray(white))  # crop BEFORE the host link
            noises = np.concatenate(noise_rows) if noise_rows else \
                np.zeros((0, len(detectors), n_window), np.float32)

            g = f.create_group(group)
            g.create_dataset("waveforms", data=waveforms.astype(np.float32))
            g.create_dataset("noises", data=noises.astype(np.float32))
            logging.info("%s: %d waveforms, %d noises", group, len(waveforms), len(noises))
    # atomic publish: an interrupted generation must not look like a corpus
    import os as _os

    _os.replace(tmp_path, output_path)
