"""Cross-library oracle closure (VERDICT r4 #4): run-where-available parity
report against the reference's actual dependency stack.

pycbc / lalsuite / ml4gw / gwpy are not installable in the build sandbox
(zero egress), so gwkit's whitening, Q-scan, and waveform parities ship as
re-implementations gated by property/golden-numpy tests (README
"Validation boundary"). This script CLOSES that boundary on any machine
where the oracles ARE installed: it loads fixed input vectors
(tests/golden/oracle_inputs.npz, checked in — the report is deterministic),
computes gwkit and oracle outputs side by side, and prints one
PASS/FAIL/SKIPPED line per check:

  whiten-psd       gwkit.ops.whiten.whiten_psd  vs  pycbc inverse-spectrum-
                   truncation whitening at a known PSD (the bnslib.whiten
                   recipe, Signal_vs_Noise/Efficiency_test/bnslib.py:62-133,
                   re-expressed directly on pycbc primitives)
  psd-zdhp         gwkit.ops.psd.aligo_zdhp_psd  vs  pycbc
                   aLIGOZeroDetHighPower (isolates the PSD source from the
                   whitening op)
  whiten-estimate  gwkit.ops.whiten.whiten_estimate  vs  the pycbc
                   welch->interpolate->IST recipe (MLGWSC-1/inference.py:
                   56-137)
  qscan            gwkit.ops.qtransform.qscan  vs  ml4gw.transforms.QScan
                   at the reference training geometry (MLGWSC-1/train.py:
                   110-115)
  resample         gwkit.ops.resample.resample_timeseries  vs
                   scipy.signal.resample (scipy ships in the sandbox, so
                   this check runs everywhere — including here)
  imrphenomd       gwkit.data.waveforms.phenomd_hplus_hcross  vs
                   lalsimulation IMRPhenomD: ZDHP-weighted mismatch table
                   over an (m1, m2, chi) grid

Pass bars for the oracle-requiring checks are provisional (chosen from the
re-implementation docstrings' documented deviations, not yet measured
against a live oracle): whiten-psd/psd-zdhp/whiten-estimate rel-L2 <=
5e-3 / 2e-2 / 2e-2, qscan rel-L2 <= 0.1 with corr >= 0.99, imrphenomd
mismatch <= 1e-2 per grid point. Rerun with the oracles installed and file
an issue if a bar is mis-set — the metrics print either way.

Usage: python scripts/validate_oracles.py [--write-fixtures]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "golden", "oracle_inputs.npz")
SAMPLE_RATE = 2048.0
DT = 1.0 / SAMPLE_RATE


def write_fixtures(path: str = FIXTURES) -> dict:
    """Deterministic input vectors. Regenerable (fixed PCG64 seed), but the
    .npz is checked in so the report never depends on RNG implementation."""
    from gwkit.ops.psd import aligo_zdhp_psd

    rng = np.random.default_rng(20260820)
    n64 = int(64 * SAMPLE_RATE)
    n32 = int(32 * SAMPLE_RATE)
    # Known-PSD whitening input: white noise shaped by sqrt(ZDHP) so the
    # strain actually has the PSD the whitener is told about (amplitudes at
    # realistic 1e-21 scale to exercise the f32 dynamic-range handling).
    psd64 = aligo_zdhp_psd(n64 // 2 + 1, 1.0 / 64.0, low_freq_cutoff=18.0)
    white = rng.normal(size=(2, n64))
    shaped_f = np.fft.rfft(white, axis=-1) * np.sqrt(psd64 / (2.0 * DT))
    strain64 = np.fft.irfft(shaped_f, n64, axis=-1) * np.sqrt(1.0 / n64 * SAMPLE_RATE)
    # Welch-estimate whitening input: independent realization, 32 s
    psd32 = aligo_zdhp_psd(n32 // 2 + 1, 1.0 / 32.0, low_freq_cutoff=18.0)
    shaped_f = np.fft.rfft(rng.normal(size=(2, n32)), axis=-1) * np.sqrt(psd32 / (2.0 * DT))
    strain32 = np.fft.irfft(shaped_f, n32, axis=-1) * np.sqrt(1.0 / n32 * SAMPLE_RATE)
    fx = {
        "strain64": strain64.astype(np.float64),
        "psd64": psd64.astype(np.float64),
        "strain32": strain32.astype(np.float64),
        # Q-scan input: whitened-unit-variance windows at the training
        # geometry (1 s @ 2048 Hz), one with a chirp-like transient
        "qwin": rng.normal(size=(4, 2048)).astype(np.float64),
        "resample_src": rng.normal(size=(3, 8192)).astype(np.float64),
        # IMRPhenomD comparison grid (aligned spins)
        "wf_m1": np.array([10.0, 20.0, 35.0, 50.0, 36.0, 15.0]),
        "wf_m2": np.array([10.0, 15.0, 30.0, 35.0, 29.0, 7.0]),
        "wf_chi1": np.array([0.0, 0.5, -0.4, 0.8, 0.3, 0.0]),
        "wf_chi2": np.array([0.0, 0.5, -0.4, 0.8, -0.2, 0.0]),
    }
    t = np.arange(2048) * DT
    fx["qwin"][0] += 8.0 * np.sin(2 * np.pi * (40.0 * (t - 0.5) + 120.0 * (t - 0.5) ** 2)) * np.exp(
        -(((t - 0.7) / 0.15) ** 2))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **fx)
    print(f"wrote {path}")
    return fx


def load_fixtures() -> dict:
    if not os.path.isfile(FIXTURES):
        return write_fixtures()
    with np.load(FIXTURES) as z:
        return {k: z[k] for k in z.files}


def rel_l2(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-300))


def report(name, status, detail):
    print(f"{status:7s} {name:16s} {detail}", flush=True)
    return status


# ---------------------------------------------------------------- checks

def check_psd_zdhp(fx):
    try:
        from pycbc.psd import from_string
    except ImportError as e:
        return report("psd-zdhp", "SKIPPED", f"pycbc not installed ({e})")
    from gwkit.ops.psd import aligo_zdhp_psd

    flen, df = len(fx["psd64"]), 1.0 / 64.0
    oracle = from_string("aLIGOZeroDetHighPower", length=flen, delta_f=df,
                         low_freq_cutoff=18.0).numpy()
    ours = aligo_zdhp_psd(flen, df, low_freq_cutoff=18.0)
    band = slice(int(20.0 / df), int(900.0 / df))  # detection band
    err = rel_l2(np.sqrt(ours[band]), np.sqrt(oracle[band]))  # ASD scale
    ok = err <= 5e-3
    return report("psd-zdhp", "PASS" if ok else "FAIL",
                  f"ASD rel-L2 (20-900 Hz) = {err:.2e} (bar 5e-3)")


def check_whiten_psd(fx):
    try:
        import pycbc.types
        from pycbc.psd import inverse_spectrum_truncation
    except ImportError as e:
        return report("whiten-psd", "SKIPPED", f"pycbc not installed ({e})")
    from gwkit.ops.whiten import whiten_psd

    strain, psd = fx["strain64"], fx["psd64"]
    got = np.asarray(whiten_psd(strain, psd, DT, low_freq_cutoff=20.0,
                                max_filter_duration=4.0))
    mfl = int(4.0 * SAMPLE_RATE)
    outs = []
    for row in strain:  # the bnslib.whiten recipe on pycbc primitives
        ts = pycbc.types.TimeSeries(row, delta_t=DT)
        p = pycbc.types.FrequencySeries(psd, delta_f=ts.delta_f)
        p = inverse_spectrum_truncation(p, max_filter_len=mfl,
                                        low_frequency_cutoff=20.0,
                                        trunc_method="hann")
        fs = ts.to_frequencyseries()
        kmin = int(20.0 / ts.delta_f)
        fs.data[:kmin] = 0
        fs.data[-1] = 0
        fs.data[kmin:] /= p[kmin:] ** 0.5
        w = fs.to_timeseries().numpy()
        outs.append(w[mfl: len(w) - mfl])
    err = rel_l2(got, np.stack(outs))
    ok = err <= 5e-3
    return report("whiten-psd", "PASS" if ok else "FAIL",
                  f"rel-L2 = {err:.2e} (bar 5e-3, f32 vs f64 pipeline)")


def check_whiten_estimate(fx):
    try:
        import pycbc.types
        from pycbc.psd import interpolate, inverse_spectrum_truncation
    except ImportError as e:
        return report("whiten-estimate", "SKIPPED", f"pycbc not installed ({e})")
    from gwkit.ops.whiten import whiten_estimate

    strain = fx["strain32"]
    got = np.asarray(whiten_estimate(strain, delta_t=DT, segment_duration=0.5,
                                     max_filter_duration=0.25,
                                     low_frequency_cutoff=18.0))
    outs = []
    mfl = int(0.25 * SAMPLE_RATE)
    for row in strain:  # inference.py:56-137 recipe
        ts = pycbc.types.TimeSeries(row, delta_t=DT)
        p = ts.psd(0.5)
        p = interpolate(p, ts.delta_f)
        p = inverse_spectrum_truncation(p, max_filter_len=mfl,
                                        low_frequency_cutoff=18.0,
                                        trunc_method="hann")
        w = (ts.to_frequencyseries() * (1.0 / p) ** 0.5).to_timeseries().numpy()
        outs.append(w[mfl // 2: len(w) - mfl // 2])
    err = rel_l2(got, np.stack(outs))
    ok = err <= 2e-2
    return report("whiten-estimate", "PASS" if ok else "FAIL",
                  f"rel-L2 = {err:.2e} (bar 2e-2, estimator recipe parity)")


def check_qscan(fx):
    try:
        import torch
        from ml4gw.transforms import QScan
    except ImportError as e:
        return report("qscan", "SKIPPED", f"ml4gw not installed ({e})")
    from gwkit.ops.qtransform import qscan

    win = fx["qwin"]
    ours = np.asarray(qscan(win, duration=1.0, sample_rate=SAMPLE_RATE,
                            q_range=(4.0, 128.0), spectrogram_shape=(128, 128),
                            norm="median"))
    q = QScan(duration=1.0, sample_rate=int(SAMPLE_RATE),
              spectrogram_shape=[128, 128], qrange=[4, 128])
    with torch.no_grad():
        oracle = q(torch.as_tensor(win[:, None, :], dtype=torch.float64))
    oracle = oracle.squeeze(1).numpy()
    err = rel_l2(ours, oracle)
    corr = float(np.corrcoef(ours.ravel(), oracle.ravel())[0, 1])
    ok = err <= 0.1 and corr >= 0.99
    return report("qscan", "PASS" if ok else "FAIL",
                  f"rel-L2 = {err:.2e} (bar 0.1), corr = {corr:.5f} (bar 0.99)")


def check_resample(fx):
    try:
        from scipy.signal import resample
    except ImportError as e:
        return report("resample", "SKIPPED", f"scipy not installed ({e})")
    from gwkit.ops.resample import resample_fourier

    src = fx["resample_src"]
    for num in (4096, 2048):
        got = np.asarray(resample_fourier(src, num))
        want = resample(src, num, axis=-1)
        err = rel_l2(got, want)
        if err > 1e-5:
            return report("resample", "FAIL", f"num={num}: rel-L2 = {err:.2e} (bar 1e-5)")
    return report("resample", "PASS", "rel-L2 <= 1e-5 at 8192->4096/2048")


def check_imrphenomd(fx):
    try:
        import lal  # noqa: F401
        import lalsimulation as lalsim
    except ImportError as e:
        return report("imrphenomd", "SKIPPED", f"lalsuite not installed ({e})")
    from gwkit.data.waveforms import phenomd_hplus_hcross
    from gwkit.ops.psd import aligo_zdhp_psd

    df, f_max, f_lower = 0.125, 1024.0, 20.0
    freqs = np.arange(0.0, f_max + df, df)
    psd = aligo_zdhp_psd(len(freqs), df, low_freq_cutoff=18.0)
    weight = np.where(freqs >= f_lower, 1.0 / psd, 0.0)
    rows = []
    worst = 0.0
    import lal as _lal

    for m1, m2, c1, c2 in zip(fx["wf_m1"], fx["wf_m2"], fx["wf_chi1"], fx["wf_chi2"]):
        hp, _ = lalsim.SimInspiralChooseFDWaveform(
            m1 * _lal.MSUN_SI, m2 * _lal.MSUN_SI, 0.0, 0.0, c1, 0.0, 0.0, c2,
            400e6 * _lal.PC_SI, 0.0, 0.0, 0.0, 0.0, 0.0, df, f_lower, f_max,
            f_lower, None, lalsim.IMRPhenomD)
        h_lal = hp.data.data[: len(freqs)]
        h_gw = np.asarray(phenomd_hplus_hcross(
            freqs, m1, m2, c1, c2, 400.0, 0.0, f_lower=f_lower)[0])

        def inner(a, b):
            return np.fft.irfft(np.conj(a) * b * weight)  # maximized over time by max below

        ovl = np.max(np.abs(inner(h_lal, h_gw)))
        norm = np.sqrt(np.max(np.abs(inner(h_lal, h_lal))) * np.max(np.abs(inner(h_gw, h_gw))))
        mm = 1.0 - ovl / norm
        worst = max(worst, mm)
        rows.append(f"    m1={m1:5.1f} m2={m2:5.1f} chi=({c1:+.1f},{c2:+.1f}): "
                    f"mismatch = {mm:.2e}")
    print("\n".join(rows))
    ok = worst <= 1e-2
    return report("imrphenomd", "PASS" if ok else "FAIL",
                  f"worst ZDHP mismatch = {worst:.2e} (bar 1e-2)")


def main():
    if "--write-fixtures" in sys.argv:
        write_fixtures()
        return
    from gwkit.utils.platform import force_cpu

    force_cpu()  # oracle comparisons are f64 host math; no chip needed
    fx = load_fixtures()
    statuses = [
        check_psd_zdhp(fx),
        check_whiten_psd(fx),
        check_whiten_estimate(fx),
        check_qscan(fx),
        check_resample(fx),
        check_imrphenomd(fx),
    ]
    n_pass = statuses.count("PASS")
    n_fail = statuses.count("FAIL")
    n_skip = statuses.count("SKIPPED")
    print(f"\noracle closure: {n_pass} PASS, {n_fail} FAIL, {n_skip} SKIPPED "
          f"(install pycbc/ml4gw/lalsuite to close the skipped checks)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
