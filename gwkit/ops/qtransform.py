"""Batched constant-Q transform (Q-scan) as fixed-shape XLA ops.

Replaces ``ml4gw.transforms.QScan`` (the reference's MLGWSC-1 front end,
MLGWSC-1/train.py:110-115 and inference.py:316-321) with a TPU-first
formulation of the standard GWpy/Omega Q-transform algorithm:

  * Q planes log-spaced by mismatch (deltam = 2*sqrt(mismatch/3));
  * per plane, frequency rows log-spaced by cumulative mismatch, each row a
    "Q tile": a bisquare-windowed band of the signal's FFT, inverse-FFT'd to
    a complex time series whose |.|^2 is the tile energy;
  * rows are normalized (median/mean over time) and bilinearly interpolated
    to a fixed ``spectrogram_shape``;
  * the scan returns the plane whose peak normalized energy is largest.

TPU-first reformulation: the per-row geometry (window sizes, FFT lengths)
is *irregular*, which would force recompilation / scalar loops if done
naively. Instead a static :class:`QPlan` is precomputed in numpy once per
(duration, sample_rate, q_range, shape) configuration:

  * every row's windowed band is scattered into a common power-of-two
    spectrum length via one precomputed gather/scatter index table, so the
    whole plane becomes ONE batched iFFT of shape (B*n_rows, n_common);
  * zero-padding to the common length is compensated with the row's
    ntiles/n_common scale so energies match the per-row iFFT values;
  * time/frequency interpolation to ``spectrogram_shape`` is a pair of
    static matmuls (bilinear weights precomputed).

Everything downstream (Q-adapter CNN) consumes the fixed-shape output, so
train and inference use identical geometry — fixing the reference's
train/inference spectrogram_shape asymmetry noted in SURVEY.md §2.10.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def next_power_of_two(x: float) -> int:
    return int(2 ** np.ceil(np.log2(max(x, 1.0))))


def q_values(q_range: Tuple[float, float], mismatch: float = 0.2) -> List[float]:
    """Log-spaced Q values covering q_range at the given mismatch (GWpy QTiling)."""
    deltam = 2.0 * np.sqrt(mismatch / 3.0)
    cumum = np.log(q_range[1] / q_range[0]) / np.sqrt(2.0)
    nplanes = int(max(np.ceil(cumum / deltam), 1))
    dq = cumum / nplanes
    return [q_range[0] * np.exp(np.sqrt(2.0) * dq * (i + 0.5)) for i in range(nplanes)]


def plane_frequencies(
    q: float, duration: float, sample_rate: float,
    f_range: Tuple[float, float] | None = None, mismatch: float = 0.2,
) -> np.ndarray:
    """Log-spaced frequency rows of one Q plane (GWpy QPlane)."""
    deltam = 2.0 * np.sqrt(mismatch / 3.0)
    if f_range is None:
        f_range = (0.0, np.inf)
    minf, maxf = f_range
    if minf == 0.0:
        minf = 50.0 * q / (2.0 * np.pi * duration)
    if np.isinf(maxf):
        maxf = sample_rate / 2.0 / (1.0 + np.sqrt(11.0) / q)
    fcum_mismatch = np.log(maxf / minf) * np.sqrt(2.0 + q ** 2) / 2.0
    nfreq = int(max(1, np.ceil(fcum_mismatch / deltam)))
    fstep = fcum_mismatch / nfreq
    fstepmin = 1.0 / duration
    freqs = [
        (minf * np.exp(2.0 / np.sqrt(2.0 + q ** 2) * (i + 0.5) * fstep)) // fstepmin * fstepmin
        for i in range(nfreq)
    ]
    return np.unique(np.asarray(freqs))


@dataclasses.dataclass(frozen=True)
class QBucket:
    """Rows sharing one native tile length L (= the row's GWpy ``ntiles``).

    The reference algorithm evaluates each row's energy series at its OWN
    power-of-two length; bucketing rows by that length and running one
    batched iFFT per bucket reproduces those grids exactly while doing
    ~6-7x less transform work than padding every row to the common maximum
    (most buckets are short enough for the MXU iDFT-matmul path).
    """
    length: int                 # native iFFT length L for these rows
    rows: np.ndarray            # original plane-major row indices (n_L,)
    gather_idx: np.ndarray      # (n_L, L) int32 into rfft bins
    gather_weight: np.ndarray   # (n_L, L) float32 bisquare window values


@dataclasses.dataclass(frozen=True)
class QPlan:
    """Static geometry for one batched Q-scan configuration."""
    duration: float
    sample_rate: float
    qs: Tuple[float, ...]
    n_common: int                      # max tile length (power of two)
    n_rows: Tuple[int, ...]            # rows per plane
    # flat scatter tables over all planes' rows (kept for testing):
    src_idx: np.ndarray                # index into rfft(strain) (clipped to valid)
    dst_idx: np.ndarray                # (row, position-in-common-spectrum) flat index
    weight: np.ndarray                 # bisquare window value * scale compensation
    row_freqs: Tuple[np.ndarray, ...]  # frequencies per plane
    freq_interp: Tuple[np.ndarray, ...]   # per plane (f_bins, n_rows)
    shape: Tuple[int, int]
    # native per-row-length formulation (the production fast path):
    buckets: Tuple[QBucket, ...] = ()
    row_inv: np.ndarray = None         # bucket-concat position of each plane-major row
    # flat plane-major per-row physics (consumed by make_stream_plan):
    row_f: np.ndarray = None           # row center frequency (Hz)
    row_q: np.ndarray = None           # row Q value

    def dense_gather(self) -> Tuple[np.ndarray, np.ndarray]:
        """Legacy common-length dense gather tables — the reference
        formulation the equivalence tests check against. Built on demand:
        the (total_rows, n_common) allocations are megabytes at inference
        geometry and the production qscan path reads only ``buckets``/
        ``row_inv``, so plan construction no longer materializes them."""
        total_rows = sum(self.n_rows)
        gi = np.zeros(total_rows * self.n_common, np.int32)
        gw = np.zeros(total_rows * self.n_common, np.float32)
        gi[self.dst_idx] = self.src_idx
        gw[self.dst_idx] = self.weight.astype(np.float32)
        return (gi.reshape(total_rows, self.n_common),
                gw.reshape(total_rows, self.n_common))


def _bilinear_taps(n_in: int, n_out: int):
    """The 2-tap form of :func:`_bilinear_matrix`: (lo, hi, w) numpy arrays
    such that out[i] = in[lo[i]]*(1-w[i]) + in[hi[i]]*w[i] — identical values
    at 2 reads per output bin instead of an (n_in, n_out) matmul."""
    lo = np.zeros(n_out, np.int32)
    hi = np.zeros(n_out, np.int32)
    w = np.zeros(n_out, np.float32)
    if n_in == 1:
        return lo, hi, w
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x = min(max(x, 0.0), n_in - 1.0)
        lo[i] = int(np.floor(x))
        hi[i] = min(lo[i] + 1, n_in - 1)
        w[i] = x - lo[i]
    return lo, hi, w


def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix with half-pixel centers
    (torch F.interpolate(align_corners=False) / jax.image.resize convention)."""
    m = np.zeros((n_out, n_in))
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x = min(max(x, 0.0), n_in - 1.0)
        lo = int(np.floor(x))
        hi = min(lo + 1, n_in - 1)
        w = x - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@functools.lru_cache(maxsize=8)
def make_qplan(
    duration: float = 1.0,
    sample_rate: float = 2048.0,
    q_range: Tuple[float, float] = (4.0, 128.0),
    spectrogram_shape: Tuple[int, int] = (128, 128),
    mismatch: float = 0.2,
) -> QPlan:
    n = int(round(duration * sample_rate))
    n_freq_bins = n // 2 + 1
    qs = q_values(q_range, mismatch)
    deltam = 2.0 * np.sqrt(mismatch / 3.0)

    all_freqs, n_rows = [], []
    src, dst, wgt = [], [], []
    max_ntiles = 1
    rows_meta = []  # (freqs, windowsizes, ntiles) per plane
    for q in qs:
        freqs = plane_frequencies(q, duration, sample_rate, mismatch=mismatch)
        qprime = q / np.sqrt(11.0)
        ws_list, nt_list = [], []
        for f in freqs:
            windowsize = 2 * int(f / qprime * duration) + 1
            tcum_mismatch = duration * 2.0 * np.pi * f / q
            ntiles = next_power_of_two(tcum_mismatch / deltam)
            ws_list.append(windowsize)
            nt_list.append(ntiles)
            max_ntiles = max(max_ntiles, ntiles)
        rows_meta.append((freqs, ws_list, nt_list))
        all_freqs.append(freqs)
        n_rows.append(len(freqs))
    n_common = max_ntiles

    row_offset = 0
    by_len: dict = {}  # L -> list of (global_row, src_k_valid, dst_k_valid, window_valid)
    for (freqs, ws_list, nt_list), q in zip(rows_meta, qs):
        qprime = q / np.sqrt(11.0)
        for r, (f, windowsize, ntiles) in enumerate(zip(freqs, ws_list, nt_list)):
            half = (windowsize - 1) // 2
            k = np.arange(windowsize) - half               # -half..half
            wfreqs = k / duration                          # Hz offsets from row center
            xfreqs = wfreqs * qprime / f
            norm = ntiles / (duration * sample_rate) * np.sqrt(
                315.0 * qprime / (128.0 * f)
            )
            window = (1.0 - xfreqs ** 2) ** 2 * norm
            center = int(round(f * duration))              # index of f in rfft grid
            src_k = center + k
            valid = (src_k >= 0) & (src_k < n_freq_bins)
            dst_k = np.mod(k, n_common)                    # ifftshift placement
            # zero-padding to n_common rescales the iFFT's 1/N normalization
            scale = 1.0  # energies use 1/ntiles normalization via explicit factor below
            src.append(src_k[valid])
            dst.append((row_offset + r) * n_common + dst_k[valid])
            wgt.append(window[valid] * (n_common / ntiles) * scale)
            # native-length bucket entry: the row at its OWN ntiles length
            # (windowsize < ntiles always — bisquare half-width is ~0.55 of
            # the tile count — so mod-placement never collides)
            by_len.setdefault(ntiles, []).append(
                (row_offset + r, src_k[valid], np.mod(k, ntiles)[valid], window[valid]))
        row_offset += len(freqs)

    buckets = []
    order = []
    for L in sorted(by_len):
        entries = by_len[L]
        gi = np.zeros((len(entries), L), np.int32)
        gw = np.zeros((len(entries), L), np.float32)
        for i, (row, s_k, d_k, win) in enumerate(entries):
            gi[i, d_k] = s_k
            gw[i, d_k] = win.astype(np.float32)
            order.append(row)
        buckets.append(QBucket(length=int(L), rows=np.asarray([e[0] for e in entries], np.int32),
                               gather_idx=gi, gather_weight=gw))
    row_inv = np.argsort(np.asarray(order, np.int64)).astype(np.int32)

    t_bins, f_bins = spectrogram_shape[1], spectrogram_shape[0]
    freq_interp = tuple(
        _bilinear_matrix(len(f), f_bins).astype(np.float32) for f in all_freqs
    )
    src_flat = np.concatenate(src).astype(np.int32)
    dst_flat = np.concatenate(dst).astype(np.int64)
    wgt_flat = np.concatenate(wgt)
    row_f = np.concatenate([m[0] for m in rows_meta]).astype(np.float64)
    row_q = np.concatenate(
        [np.full(len(m[0]), q, np.float64) for m, q in zip(rows_meta, qs)]
    )
    return QPlan(
        duration=duration,
        sample_rate=sample_rate,
        qs=tuple(qs),
        n_common=n_common,
        n_rows=tuple(n_rows),
        src_idx=src_flat,
        dst_idx=dst_flat,
        weight=wgt_flat,
        row_freqs=tuple(all_freqs),
        freq_interp=freq_interp,
        shape=(f_bins, t_bins),
        buckets=tuple(buckets),
        row_inv=row_inv,
        row_f=row_f,
        row_q=row_q,
    )


def qscan(
    strain: jnp.ndarray,
    plan: QPlan | None = None,
    *,
    duration: float = 1.0,
    sample_rate: float = 2048.0,
    q_range: Tuple[float, float] = (4.0, 128.0),
    spectrogram_shape: Tuple[int, int] = (128, 128),
    norm: str = "median",
    median_stride: int = 1,
    time_decimation: int = 1,
) -> jnp.ndarray:
    """Q-scan of (B, N) strain -> (B, f_bins, t_bins) normalized energy.

    Per-row-native formulation (GWpy/ml4gw parity): every row's energy
    series is evaluated at its OWN power-of-two tile length (``ntiles``),
    exactly like the reference algorithm — rows are bucketed by that length
    and each bucket runs as one batched iFFT (MXU iDFT matmuls for lengths
    <= 1024, XLA FFT above — the crossover measured on v5e). Rows are then
    median-normalized and bilinearly interpolated (2-tap gathers) from
    their native grids to the fixed ``spectrogram_shape``; the scan returns
    per sample the plane with the largest peak normalized energy.

    This replaces the round-1/2 common-length padding (every row upsampled
    to max ntiles by zero-padded iFFT): the native grids are both the
    reference's semantics AND ~3x faster — which also retires the round-2
    ``time_decimation=4`` serving shortcut (kept as a legacy knob: d > 1
    folds each bucket's spectrum to L/d, exact at the sampled points, but
    the default d=1 is now the fast path).

    ``median_stride`` > 1 estimates a row's median normalizer from every
    k-th sample; each bucket clamps the stride so at least 64 samples (or
    the full row, if shorter) enter the estimate. The sort under jnp.median
    is the scan's most expensive VPU op; serving uses stride 8, golden
    tests keep 1 (exact medians on every row length).
    """
    if plan is None:
        plan = make_qplan(duration, sample_rate, q_range, spectrogram_shape)
    B = strain.shape[0]
    t_bins = plan.shape[1]
    d = max(1, int(time_decimation))

    fseries = jnp.fft.rfft(strain.astype(jnp.float32), axis=-1)  # (B, F)
    tinterp_parts, rowmax_parts = [], []
    for bucket in plan.buckets:
        # dense gather: every (row, spectrum-slot) reads at most one rfft bin
        spec = fseries[:, bucket.gather_idx] * jnp.asarray(bucket.gather_weight)
        L = bucket.length
        # legacy decimation folds only rows that keep >= t_bins native
        # resolution — folding short rows below the output grid blurs them
        # for no meaningful saving (short buckets are already cheap)
        folded = d > 1 and L // d >= t_bins
        if folded:
            spec = spec.reshape(*spec.shape[:-1], d, L // d).sum(axis=-2)
            L = L // d
        if L <= 1024:
            # short transforms ride the MXU: dense iDFT as four f32 matmuls
            # ('highest' precision, ~1e-5 of the FFT result)
            tgrid = np.arange(L)
            m = np.exp(2j * np.pi * np.outer(tgrid, tgrid) / L) / L
            mr, mi = jnp.asarray(m.real, jnp.float32), jnp.asarray(m.imag, jnp.float32)
            sr, si = spec.real, spec.imag
            prec = jax.lax.Precision.HIGHEST
            yr = jnp.matmul(sr, mr.T, precision=prec) - jnp.matmul(si, mi.T, precision=prec)
            yi = jnp.matmul(sr, mi.T, precision=prec) + jnp.matmul(si, mr.T, precision=prec)
            energy = yr ** 2 + yi ** 2  # (B, n_L, L)
        else:
            energy = jnp.fft.ifft(spec, axis=-1)
            energy = energy.real ** 2 + energy.imag ** 2
        if folded and norm == "none":
            # fold rescale; for median/mean norms it cancels exactly in
            # energy/denom, so the multiply pass is skipped there
            energy = energy * (1.0 / d ** 2)

        # row normalizer (GWpy median over time by default) from the raw
        # native-grid energies; division is deferred to the t_bins-wide
        # interpolated tensor (normalizers are constant along time and
        # interpolation is linear, so interp(e)/den == interp(e/den))
        if norm == "median":
            s = min(median_stride, max(1, L // 64))
            sample = energy[..., ::s] if s > 1 else energy
            denom = jnp.median(sample, axis=-1, keepdims=True)
        elif norm == "mean":
            denom = jnp.mean(energy, axis=-1, keepdims=True)
        else:
            denom = jnp.ones_like(energy[..., :1])
        denom = jnp.maximum(denom, 1e-30)

        # bilinear time interp from the native grid: exactly 2 taps per
        # output bin -> two static minor-dim gathers + a lerp (the dense
        # (L, t_bins) matmul computes identical values at ~L/2x the FLOPs)
        lo, hi, w = _bilinear_taps(L, t_bins)
        tlow = energy[..., lo]
        thigh = energy[..., hi]
        tinterp_parts.append((tlow + jnp.asarray(w) * (thigh - tlow)) / denom)
        # plane peak of NORMALIZED energy == raw row max / denom (denom > 0)
        rowmax_parts.append(jnp.max(energy, axis=-1) / denom[..., 0])

    # back to plane-major row order (static permutation)
    tinterp = jnp.concatenate(tinterp_parts, axis=1)[:, plan.row_inv]  # (B, rows, t_bins)
    rowmax = jnp.concatenate(rowmax_parts, axis=1)[:, plan.row_inv]  # (B, rows)
    return _plane_select(tinterp, rowmax, plan)


def _plane_select(tinterp: jnp.ndarray, rowmax: jnp.ndarray, plan: QPlan) -> jnp.ndarray:
    """Shared Q-scan epilogue: per-plane frequency interpolation + per-sample
    best-plane selection (largest peak normalized energy, GWpy semantics).

    ``tinterp`` (B, total_rows, t_bins) and ``rowmax`` (B, total_rows) are in
    plane-major row order; returns (B, f_bins, t_bins)."""
    specs, peaks = [], []
    offset = 0
    for p, nr in enumerate(plan.n_rows):
        rows = tinterp[:, offset : offset + nr, :]  # (B, nr, t_bins)
        s = jnp.einsum("fr,brt->bft", jnp.asarray(plan.freq_interp[p]), rows)
        specs.append(s)
        peaks.append(jnp.max(rowmax[:, offset : offset + nr], axis=-1))
        offset += nr
    stacked = jnp.stack(specs, axis=1)  # (B, nplanes, f, t)
    peak = jnp.stack(peaks, axis=1)  # (B, nplanes)
    best = jnp.argmax(peak, axis=1)
    return jnp.take_along_axis(stacked, best[:, None, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Streaming (window-overlap-reuse) Q-scan — PERF ledger lever 4.
#
# Search windows at 0.1 s stride share 95% of their samples, yet the exact
# per-window Q-scan re-runs every row's band iDFT per window. The streaming
# formulation transforms a CHUNK of whitened strain once — one band iFFT per
# Q row over the whole chunk — and serves each window by cropping its 1 s
# span out of every row's energy series (fractional-offset 2-tap interp to
# the output grid; median/peak from a strided native-grid crop). Transform
# work per window drops ~chunk/window-duration-fold (~10x at a 16 s chunk).
#
# NOT exact parity with the per-window transform (ml4gw QScan slices the
# window first): the chunk transform sees data PAST the window boundary
# wherever a Q window's time support crosses it, while the per-window
# transform wraps periodically at the window edge. The bisquare bands here
# have ~20-40 ms time support, so interior samples match closely and the
# difference concentrates in the outer ~2 time bins of low-frequency rows.
# Like the int8 path, this mode is OPT-IN and gated by a trained-checkpoint
# parity report (scripts/validate_stream.py, docs/results/stream_parity.md).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StreamBucket:
    """One window-plan bucket's rows, transformed at chunk scale.

    Stores COMPACT per-row band parameters (center bin, half-width,
    qprime/f, normalization) rather than dense (n_rows, L_b) gather tables:
    at block scale (256 s chunks) dense tables would be ~100 MB of baked jit
    constants; :func:`stream_energies` rebuilds the band windows on the fly
    from these vectors with broadcasting. The dense tables remain available
    as properties for tests/small geometries."""
    window_length: int          # L_w: the row's native per-window ntiles
    length: int                 # L_b = L_w * chunk_seconds / window_duration
    chunk_seconds: int
    n_bins: int                 # chunk rfft bins (index validity bound)
    rows: np.ndarray            # plane-major row indices (same as QBucket)
    centers: np.ndarray         # (n_rows,) int32 rfft bin of each row center
    halves: np.ndarray          # (n_rows,) int32 band half-width in bins
    qpof: np.ndarray            # (n_rows,) f64 qprime / f
    normv: np.ndarray           # (n_rows,) f64 row normalization constant

    def _signed_offsets(self) -> np.ndarray:
        j = np.arange(self.length)
        return ((j + self.length // 2) % self.length) - self.length // 2

    @property
    def gather_idx(self) -> np.ndarray:
        k = self._signed_offsets()
        idx = self.centers[:, None] + k[None, :]
        valid = ((np.abs(k)[None, :] <= self.halves[:, None])
                 & (idx >= 0) & (idx < self.n_bins))
        return np.where(valid, idx, 0).astype(np.int32)

    @property
    def gather_weight(self) -> np.ndarray:
        k = self._signed_offsets()
        idx = self.centers[:, None] + k[None, :]
        valid = ((np.abs(k)[None, :] <= self.halves[:, None])
                 & (idx >= 0) & (idx < self.n_bins))
        xf = np.clip((k[None, :] / self.chunk_seconds) * self.qpof[:, None], -1.0, 1.0)
        w = (1.0 - xf ** 2) ** 2 * self.normv[:, None]
        return np.where(valid, w, 0.0).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class StreamPlan:
    base: QPlan                 # the per-window plan (rows/planes/interp)
    chunk_seconds: int          # chunk duration (s; power of two)
    chunk_samples: int          # chunk_seconds * sample_rate
    buckets: Tuple[StreamBucket, ...]


@functools.lru_cache(maxsize=8)
def make_stream_plan(
    duration: float = 1.0,
    sample_rate: float = 2048.0,
    q_range: Tuple[float, float] = (4.0, 128.0),
    spectrogram_shape: Tuple[int, int] = (128, 128),
    mismatch: float = 0.2,
    chunk_seconds: int = 16,
) -> StreamPlan:
    """Chunk-scale gather tables for every row of the per-window Q plan.

    Each row keeps its window-plan center frequency and Q; its bisquare band
    window is re-evaluated on the chunk's rfft grid (df = 1/chunk_seconds)
    over the same fractional frequency support, and its energy series length
    scales to L_b = ntiles * chunk_seconds / duration — i.e. the row's
    native per-window sampling rate, sustained across the chunk, so a window
    crop of L_w samples lands on exactly the per-window grid instants.

    The per-row normalization constant is the window plan's: for a transient
    fully inside a window, the chunk rfft's bins interpolate the window
    rfft's at the same amplitude, and the iFFT's 1/L_b absorbs the ~T_c-fold
    larger number of contributing band bins, so energies match per-window
    values without rescaling (exactly so for norm='median'/'mean', where any
    per-row constant cancels).
    """
    base = make_qplan(duration, sample_rate, q_range, spectrogram_shape, mismatch)
    t_c = int(chunk_seconds)
    if t_c % duration != 0 or t_c <= duration:
        raise ValueError("chunk_seconds must be a multiple of (and exceed) duration")
    c_samples = int(round(t_c * sample_rate))
    n_bins = c_samples // 2 + 1
    sbuckets = []
    for b in base.buckets:
        l_w = b.length
        l_b = int(l_w * t_c / duration)
        f = base.row_f[b.rows]
        q = base.row_q[b.rows]
        qprime = q / np.sqrt(11.0)
        halves = (f / qprime * t_c).astype(np.int64)
        assert (2 * halves + 1 <= l_b).all(), "band wider than the row's chunk grid"
        normv = l_w / (duration * sample_rate) * np.sqrt(315.0 * qprime / (128.0 * f))
        sbuckets.append(StreamBucket(
            window_length=l_w, length=l_b, chunk_seconds=t_c, n_bins=n_bins,
            rows=b.rows,
            centers=np.round(f * t_c).astype(np.int32),
            halves=halves.astype(np.int32),
            qpof=(qprime / f).astype(np.float64),
            normv=normv.astype(np.float64),
        ))
    return StreamPlan(base=base, chunk_seconds=t_c, chunk_samples=c_samples,
                      buckets=tuple(sbuckets))


@functools.lru_cache(maxsize=32)
def _idft_factors(length: int):
    """Four-step iDFT factors for a power-of-two length > 1024: near-square
    L = L1*L2 with IDFT matrices of each factor plus the coupling twiddle.
    Derivation: X viewed as (L2, L1) with X[k1 + L1*k2] -> IDFT_{L2} over k2
    -> * exp(2pi i m2 k1 / L) -> IDFT_{L1} over k1 -> x[m1*L2 + m2]."""
    l1 = 1 << ((int(np.log2(length)) + 1) // 2)
    l2 = length // l1
    w2 = np.exp(2j * np.pi * np.outer(np.arange(l2), np.arange(l2)) / l2) / l2
    w1 = np.exp(2j * np.pi * np.outer(np.arange(l1), np.arange(l1)) / l1) / l1
    tw = np.exp(2j * np.pi * np.outer(np.arange(l2), np.arange(l1)) / length)
    return l1, l2, w2, tw, w1


def _cmatmul(ar, ai, br, bi, *, left: bool):
    """Complex matmul as four f32 real matmuls at HIGHEST precision.
    left=True computes M @ A over the -2 axis (M=(b*, ...)), else A @ M^T
    over the -1 axis."""
    prec = jax.lax.Precision.HIGHEST
    if left:
        mm = lambda m, x: jnp.einsum("mk,...kl->...ml", m, x, precision=prec)
    else:
        mm = lambda x, m: jnp.einsum("...km,nm->...kn", x, m, precision=prec)
    if left:
        yr = mm(br, ar) - mm(bi, ai)
        yi = mm(br, ai) + mm(bi, ar)
    else:
        yr = mm(ar, br) - mm(ai, bi)
        yi = mm(ai, br) + mm(ar, bi)
    return yr, yi


def _ifft_energy_mxu(sr: jnp.ndarray, si: jnp.ndarray, length: int) -> jnp.ndarray:
    """|ifft(spec)|^2 along the last axis, entirely as MXU matmuls.

    XLA's TPU FFT is the streaming Q-scan's bottleneck at chunk scale (the
    5 band iFFTs cost as much as the ENTIRE exact per-window Q-scan —
    docs/PERF.md lever 4 profile): at the stream path's small series counts
    the dense iDFT (L <= 1024) / four-step factorized iDFT (above, two
    matmuls with <=~180^2 factors + twiddle) is ~an order of magnitude
    cheaper. f32 'highest' matmuls agree with the FFT to ~1e-5, like the
    exact path's L<=1024 iDFT-matmul route."""
    if length <= 1024:
        tgrid = np.arange(length)
        m = np.exp(2j * np.pi * np.outer(tgrid, tgrid) / length) / length
        yr, yi = _cmatmul(sr, si,
                          jnp.asarray(m.real, jnp.float32),
                          jnp.asarray(m.imag, jnp.float32), left=False)
        return yr ** 2 + yi ** 2
    l1, l2, w2, tw, w1 = _idft_factors(length)
    ar = sr.reshape(*sr.shape[:-1], l2, l1)
    ai = si.reshape(*si.shape[:-1], l2, l1)
    yr, yi = _cmatmul(ar, ai,
                      jnp.asarray(w2.real, jnp.float32),
                      jnp.asarray(w2.imag, jnp.float32), left=True)
    twr = jnp.asarray(tw.real, jnp.float32)
    twi = jnp.asarray(tw.imag, jnp.float32)
    yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
    zr, zi = _cmatmul(yr, yi,
                      jnp.asarray(w1.real, jnp.float32),
                      jnp.asarray(w1.imag, jnp.float32), left=False)
    # x[m1*L2 + m2] = Z[..., m2, m1]
    e = zr ** 2 + zi ** 2
    e = jnp.swapaxes(e, -1, -2)
    return e.reshape(*e.shape[:-2], length)


def stream_energies(chunk: jnp.ndarray, plan: StreamPlan) -> Tuple[jnp.ndarray, ...]:
    """Per-bucket (D, n_rows, L_b) Q-row energy series of one strain chunk.

    Computed ONCE per chunk/whitening block — the expensive half of the
    streaming Q-scan (chunk rfft + band iDFTs, all as MXU matmuls; XLA's TPU
    FFT at these shapes costs as much as the entire exact per-window scan).

    Each row's band is extracted as a STATIC CONTIGUOUS slice of the
    zero-padded rfft (row centers are plan constants), never an element
    gather: a (n_rows, L_b) runtime-index gather here measured ~300 ms per
    256 s block on TPU vs <1 ms of DMA for the equivalent slices. The slice
    holds the band in natural order (center bin at t = L/2) instead of the
    iFFT's signed-offset order; the reorder is a circular shift by L/2,
    which under the iDFT is the phase factor (-1)^m — erased by |.|^2, so
    the energies are exactly those of the signed-offset transform. Band
    windows are rebuilt on the fly from the bucket's compact per-row
    vectors, so no (n_rows, L_b) table is baked into the executable."""
    fseries = jnp.fft.rfft(chunk.astype(jnp.float32), axis=-1)  # (D, n_bins)
    n_bins = fseries.shape[-1]
    out = []
    for sb in plan.buckets:
        length = sb.length
        half_l = length // 2
        back = max(0, int(sb.centers.max()) + half_l - n_bins)
        padded = jnp.pad(fseries, ((0, 0), (half_l, back)))
        # row i's band occupies original bins [c_i - L/2, c_i + L/2), i.e.
        # padded bins [c_i, c_i + L): a static slice per row (DMA, no gather)
        spec = jnp.stack(
            [jax.lax.slice_in_dim(padded, int(c), int(c) + length, axis=1)
             for c in sb.centers], axis=1)  # (D, n_rows, L)
        k = np.arange(length) - half_l  # natural-order signed offsets
        xf = jnp.clip(
            jnp.asarray(k / sb.chunk_seconds, jnp.float32)[None, :]
            * jnp.asarray(sb.qpof, jnp.float32)[:, None], -1.0, 1.0)
        w = jnp.where(
            jnp.asarray(np.abs(k), jnp.int32)[None, :]
            <= jnp.asarray(sb.halves, jnp.int32)[:, None],
            (1.0 - xf ** 2) ** 2 * jnp.asarray(sb.normv, jnp.float32)[:, None],
            0.0)
        out.append(_ifft_energy_mxu(spec.real * w, spec.imag * w, length))
    return tuple(out)


def stream_crops(
    energies: Tuple[jnp.ndarray, ...],
    starts_sec: jnp.ndarray,
    plan: StreamPlan,
    *,
    norm: str = "median",
    median_stride: int = 1,
) -> jnp.ndarray:
    """Q spectrograms of B windows cropped from precomputed row energies.

    ``starts_sec`` (B,) window start times in seconds RELATIVE TO THE CHUNK
    START (may be traced and fractional — crops interpolate). Returns
    (B, D, f_bins, t_bins) normalized energy, the same surface as
    :func:`qscan` on the isolated windows (up to the boundary semantics
    documented above). Normalization (median/mean over time) and the
    best-plane peak come from a strided crop of the row's native-grid
    energies, mirroring :func:`qscan`'s ``median_stride`` semantics."""
    base = plan.base
    t_bins = base.shape[1]
    w_dur = base.duration
    d_det = energies[0].shape[0]
    b_win = starts_sec.shape[0]
    tparts, mparts = [], []
    for sb, energy in zip(plan.buckets, energies):
        l_w, l_b = sb.window_length, sb.length
        n_r = energy.shape[1]
        rate = l_w / w_dur  # row-grid samples per second
        pos0 = starts_sec * rate  # (B,) fractional row-grid window starts
        # ONE batched contiguous crop per window (l_w + 3 native samples at
        # the integer-aligned start); every tap below is a STATIC slice of
        # it. The per-tap runtime-index gathers this replaces were the crop
        # cost on TPU (~10 ms/batch of element gathers vs ~0.5 ms of DMA).
        i0 = jnp.clip(jnp.floor(pos0).astype(jnp.int32), 0, l_b - (l_w + 3))
        frac = pos0 - i0.astype(jnp.float32)  # [0, 1) away from the clamp
        crop = jax.vmap(
            lambda s: jax.lax.dynamic_slice(energy, (0, 0, s), (d_det, n_r, l_w + 3))
        )(i0)  # (B, D, n_rows, l_w + 3)
        # strided native crop -> median normalizer + plane-selection peak;
        # round(pos0) = i0 + (frac >= 0.5): two static strided slices + select
        s = min(median_stride, max(1, l_w // 64))
        ro = (frac >= 0.5)[:, None, None, None]
        mcrop = jnp.where(ro, crop[..., 1 : l_w + 1 : s], crop[..., 0:l_w:s])
        if norm == "median":
            denom = jnp.median(mcrop, axis=-1)
        elif norm == "mean":
            denom = jnp.mean(mcrop, axis=-1)
        else:
            denom = jnp.ones(mcrop.shape[:-1], mcrop.dtype)
        denom = jnp.maximum(denom, 1e-30)  # (B, D, n_rows)
        mparts.append(jnp.max(mcrop, axis=-1) / denom)
        # 2-tap interp onto the output time grid: the window-relative tap
        # positions are STATIC (xtap), so floor(frac + xtap) is flo or
        # flo + 1 — three static taps of the crop cover both, blended
        # elementwise by u = frac + (xtap - flo). When l_w/t_bins is an
        # integer the taps are plain strided slices.
        xtap = np.clip((np.arange(t_bins) + 0.5) * (l_w / t_bins) - 0.5,
                       0.0, l_w - 1.0)
        flo = np.floor(xtap).astype(np.int64)
        step = np.diff(flo)
        if len(flo) > 1 and (step == step[0]).all() and step[0] >= 1:
            st = int(step[0])
            taps = [crop[..., int(flo[0]) + d : int(flo[0]) + d + st * t_bins : st]
                    for d in (0, 1, 2)]
        else:
            taps = [jnp.take(crop, jnp.asarray(flo + d, jnp.int32), axis=-1)
                    for d in (0, 1, 2)]
        u = frac[:, None] + jnp.asarray(xtap - flo, jnp.float32)[None]  # (B, t)
        ub = u[:, None, None, :]
        tint = jnp.where(ub < 1.0,
                         (1.0 - ub) * taps[0] + ub * taps[1],
                         (2.0 - ub) * taps[1] + (ub - 1.0) * taps[2])
        tparts.append(tint / denom[..., None])  # (B, D, n_rows, t_bins)
    tinterp = jnp.concatenate(tparts, axis=2)[:, :, base.row_inv]
    rowmax = jnp.concatenate(mparts, axis=2)[:, :, base.row_inv]
    # plane selection is per (window, detector) sample, like qscan on the
    # detector-folded batch
    out = _plane_select(tinterp.reshape(b_win * d_det, -1, t_bins),
                        rowmax.reshape(b_win * d_det, -1), base)
    return out.reshape(b_win, d_det, *base.shape)


def qscan_stream(
    chunk: jnp.ndarray,
    starts_sec: jnp.ndarray,
    plan: StreamPlan,
    *,
    norm: str = "median",
    median_stride: int = 1,
) -> jnp.ndarray:
    """One-shot streaming Q-scan: :func:`stream_energies` (once per chunk) +
    :func:`stream_crops` (per window batch). The search engine calls the two
    halves separately so a whitening block's energies serve EVERY batch of
    its windows (gwkit.search.slicer.fused_scores_stream)."""
    return stream_crops(stream_energies(chunk, plan), starts_sec, plan,
                        norm=norm, median_stride=median_stride)
