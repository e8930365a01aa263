"""Quantify what the aligned-spin projection costs on the ds3/4 population
(VERDICT r3 item 4): for challenge-dataset-3 injections, compute the
matched-filter MATCH between the precessing waveform (PhenomP twist,
gwkit.data.imrphenomp — what ds3/4 now injects) and its aligned-spin
projection (IMRPhenomD with only the z spin components — what rounds 1-2
injected, and what a quasi-aligned search template bank effectively sees).

match = max_{t, phi} <h_prec, h_align> / (|h_prec| |h_align|) with the
aLIGOZeroDetHighPower inner product, computed per detector (H1) including
antenna response. A match m means an aligned analysis recovers fraction m
of the SNR; detection volume scales as m^3.

Writes docs/results/precession_bias.md with the match distribution overall
and binned by chi_p. Runs fine on CPU (~500 waveforms):
    python scripts/precession_bias.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax.numpy as jnp

    from gwkit.data.generate import challenge_distribution, _project_injection_batch
    from gwkit.ops.psd import get_psd

    n = int(os.environ.get("BIAS_N", "500"))
    dur, fs, f_low = 16.0, 2048.0, 20.0
    n_samp = int(dur * fs)
    rng = np.random.default_rng(42)
    dist = challenge_distribution(3)
    params = dist.sample(rng, n)
    params["tc"] = np.full(n, 0.75 * dur)

    psd = np.asarray(get_psd("aLIGOZeroDetHighPower", n_samp // 2 + 1, 1.0 / dur, f_low - 2.0))
    freqs = np.arange(n_samp // 2 + 1) / dur
    w = np.where((freqs >= f_low) & (psd > 0), 1.0 / np.maximum(psd, 1e-60), 0.0)

    def detector_fd(approximant):
        waves = []
        for s in range(0, n, 64):
            sl = slice(s, min(s + 64, n))
            h = _project_injection_batch(params, sl, dur, fs, f_low, 1e20,
                                         ["H1"], approximant=approximant)
            waves.append(h[:, 0])
        return np.fft.rfft(np.concatenate(waves), axis=-1)

    hp_f = detector_fd("imrphenomp")
    ha_f = detector_fd("imrphenomd")

    def norm(hf):
        return np.sqrt(np.sum(w * np.abs(hf) ** 2, axis=-1))

    # complex correlation over time lags from the ONE-SIDED product (the
    # analytic signal): |z| maximizes over phase, the lag axis over time;
    # overall inner-product constants cancel in the normalized match
    z = np.fft.ifft(
        np.concatenate([hp_f * np.conj(ha_f) * w,
                        np.zeros((n, n_samp - hp_f.shape[-1]))], axis=-1), axis=-1)
    match = np.abs(z).max(axis=-1) * n_samp / np.maximum(norm(hp_f) * norm(ha_f), 1e-30)
    match = np.minimum(match, 1.0)
    chip = params["chi_p"]

    bins = [(0.0, 0.2), (0.2, 0.4), (0.4, 0.6), (0.6, 0.8), (0.8, 1.0)]
    lines = [
        "# Aligned-projection recovery bias on the ds3 population",
        "",
        f"{n} challenge-dataset-3 injections (isotropic spin vectors, magnitude",
        "U(0, 0.99)); match between the precessing injection (PhenomP twist,",
        "leading-order single-spin angles — gwkit.data.imrphenomp) and its",
        "aligned-spin IMRPhenomD projection, H1 response, aLIGOZeroDetHighPower",
        "inner product, maximized over time and phase. SNR recovered by an",
        "aligned analysis = match; sensitive volume factor = match^3.",
        "",
        f"overall: median {np.median(match):.4f}, mean {match.mean():.4f}, "
        f"10th pct {np.percentile(match, 10):.4f}, min {match.min():.4f}",
        "",
        "| chi_p bin | n | median match | 10th pct | median volume factor |",
        "|---|---|---|---|---|",
    ]
    for lo, hi in bins:
        m = match[(chip >= lo) & (chip < hi)]
        if len(m) == 0:
            continue
        lines.append(f"| [{lo:.1f}, {hi:.1f}) | {len(m)} | {np.median(m):.4f} "
                     f"| {np.percentile(m, 10):.4f} | {np.median(m)**3:.3f} |")
    lines += [
        "",
        "Interpretation: rounds 1-2 injected the aligned projection directly,",
        "so ds3/4 sensitive-distance results there are effectively evaluated",
        "on a population whose precession-induced SNR loss (table above) was",
        "absorbed into the injection itself. With round 3's precessing",
        "injections the loss is carried by the data, as in the reference's",
        "IMRPhenomXPHM datasets.",
    ]
    out = os.path.join(REPO, "docs", "results", "precession_bias.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
