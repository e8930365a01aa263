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

    def matches(hf_a, hf_b):
        # complex correlation over time lags from the ONE-SIDED product (the
        # analytic signal): |z| maximizes over phase, the lag axis over time;
        # overall inner-product constants cancel in the normalized match
        pad = np.zeros((hf_a.shape[0], n_samp - hf_a.shape[-1]))
        z = np.fft.ifft(np.concatenate([hf_a * np.conj(hf_b) * w, pad], axis=-1),
                        axis=-1)
        m = (np.abs(z).max(axis=-1) * n_samp
             / np.maximum(norm(hf_a) * norm(hf_b), 1e-30))
        return np.minimum(m, 1.0)

    match = matches(hp_f, ha_f)
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

    # --- Euler-angle approximation error: LO chi_p twist vs two-spin ODE ---
    # Both waveforms carry the same higher modes; the only difference is the
    # precession angles (closed-form leading-order single-spin vs the
    # orbit-averaged two-spin Kidder ODE, gwkit.data.precession_ode). Their
    # mismatch bounds what ds3/4's default 'imrphenomxphm' injections still
    # miss relative to a genuine two-spin model.
    n_ode = int(os.environ.get("BIAS_N_ODE", str(min(n, 200))))
    params_ode = {k: v[:n_ode] for k, v in params.items()}

    def detector_fd_sub(approximant):
        waves = []
        for s in range(0, n_ode, 32):
            sl = slice(s, min(s + 32, n_ode))
            h = _project_injection_batch(params_ode, sl, dur, fs, f_low, 1e20,
                                         ["H1"], approximant=approximant)
            waves.append(h[:, 0])
        return np.fft.rfft(np.concatenate(waves), axis=-1)

    hf_lo = detector_fd_sub("imrphenomxphm")
    hf_ode = detector_fd_sub("imrphenomxphm-twospin")
    m_ang = matches(hf_ode, hf_lo)
    chip_ode = params_ode["chi_p"]
    # in-plane secondary-spin magnitude: where two-spin effects live
    s2perp = np.sqrt(params_ode.get("spin2x", np.zeros(n_ode)) ** 2
                     + params_ode.get("spin2y", np.zeros(n_ode)) ** 2)
    lines += [
        "",
        "## Angle-approximation error: leading-order chi_p twist vs two-spin ODE",
        "",
        f"{n_ode} of the same injections; match between 'imrphenomxphm' (the",
        "ds3/4 default: closed-form leading-order single-spin Euler angles,",
        "chi_p summary) and 'imrphenomxphm-twospin' (orbit-averaged two-spin",
        "precession ODE consuming the full in-plane spin vectors). This is the",
        "residual angle error the default injections carry relative to a",
        "genuine two-spin treatment:",
        "",
        f"overall: median {np.median(m_ang):.4f}, mean {m_ang.mean():.4f}, "
        f"10th pct {np.percentile(m_ang, 10):.4f}, min {m_ang.min():.4f}",
        "",
        "| chi_p bin | n | median match | 10th pct |",
        "|---|---|---|---|",
    ]
    for lo, hi in bins:
        m = m_ang[(chip_ode >= lo) & (chip_ode < hi)]
        if len(m) == 0:
            continue
        lines.append(f"| [{lo:.1f}, {hi:.1f}) | {len(m)} | {np.median(m):.4f} "
                     f"| {np.percentile(m, 10):.4f} |")
    hi_s2 = m_ang[s2perp > np.median(s2perp)]
    lo_s2 = m_ang[s2perp <= np.median(s2perp)]
    lines += [
        "",
        f"Split by in-plane secondary spin |s2_perp| (two-spin effects): "
        f"median match {np.median(lo_s2):.4f} below the population median "
        f"|s2_perp|, {np.median(hi_s2):.4f} above.",
    ]
    out = os.path.join(REPO, "docs", "results", "precession_bias.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
