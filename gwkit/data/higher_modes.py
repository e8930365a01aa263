"""Aligned-spin FD waveforms with higher harmonics (PhenomHM-style).

The reference generates challenge datasets 3/4 with lalsuite's
IMRPhenomXPHM (MLGWSC-1/gen.py:131-147), which carries both precession and
higher multipoles. gwkit splits the two effects: precession is the PhenomP
twist (gwkit.data.imrphenomp); this module supplies the higher-mode
content via the construction that seeds IMRPhenomHM (London et al. 2018,
arXiv:1708.00404 — their eq. 5 "rescaled-PhenomD" ansatz):

* each co-precessing mode (l, m) is the PhenomD (2,2) amplitude/phase
  evaluated at the leading-order mapped frequency f_22 = (2/m) f — exact
  through the inspiral, where all modes share one orbital phase
  (phi_lm = m Phi_orb, so phi_lm(f) = (m/2) phi_22(2f/m)); through
  merger-ringdown the same map lands the mode's ringdown at (m/2) f_RD22
  instead of the mode's own QNM f_RDlm (a ~5-10% placement bias for
  (3,3)/(4,4) — the refinement PhenomHM adds with per-mode QNM maps and
  the one documented deviation of this model);
* mode amplitudes follow the post-Newtonian hierarchy |H_lm/H_22|(v)
  (Blanchet's living review / Arun et al. 2009): the odd-m modes enter at
  O(v) with the mass-asymmetry delta = (m1-m2)/M and carry the
  relative-PN modulus corrections through O(v^3) (see
  :func:`pn_mode_ratio`); the (3,2)/(4,4) at O(v^2) with (1-3 eta) at
  leading order (their 1PN series breaks down mid-inspiral — documented in
  pn_mode_ratio) — so the odd-m modes vanish identically at equal mass
  (tested) and the SPA Jacobian contributes sqrt(2/m) (both legs at the
  same orbital time t_f: Phi_dot = 2 pi f / m);
* polarizations assemble with spin-weight -2 spherical harmonics and the
  aligned-spin equatorial symmetry h_{l,-m} = (-1)^l conj(h_{lm}), the
  standard positive-frequency FD form

      h+(f) = 1/2 sum_m>0 h_lm(f) [Y_lm + (-1)^l conj(Y_{l,-m})]
      hx(f) = i/2 sum_m>0 h_lm(f) [Y_lm - (-1)^l conj(Y_{l,-m})].

Validation boundary (documented, tested in tests/test_higher_modes.py):
no external oracle (lalsuite) exists in this environment, so the model is
pinned by exact limits instead of cross-validation — modes=((2,2),)
reproduces phenomd_hplus_hcross identically; all higher modes vanish at
equal mass; the generic Goldberg-sum harmonics reproduce the hand-written
l=2 row of gwkit.data.imrphenomp and satisfy the (2l+1)/(4 pi) sum rule;
the (3,3) spectrum peaks at 3/2 the (2,2) peak.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# single-source the unit constants: phenomd_h22 (the base these modes are
# built from) uses waveforms' derived MTSUN_SI, and a 2e-4 mismatch against
# the hardcoded lal value shifts the phase visibly (~0.02 rad at 20 Hz)
from gwkit.data.waveforms import C_SI, MPC_SI, MTSUN_SI  # noqa: E402

#: Modes carried by default: the (2,2) plus the four loudest subdominants
#: of IMRPhenomHM (London et al. 2018 table I).
DEFAULT_MODES: Tuple[Tuple[int, int], ...] = ((2, 2), (2, 1), (3, 3), (3, 2), (4, 4))


def sylm(l: int, m: int, theta) -> jnp.ndarray:
    """Spin-weight -2 spherical harmonic ^{-2}Y_{lm}(theta, phi=0), real.

    Goldberg et al. 1967 sum (the lalsuite convention): with s = -2,

      sYlm = (-1)^(l+m-s?) ... written via the Wigner-d relation
      sYlm(theta, 0) = (-1)^s sqrt((2l+1)/(4 pi)) d^l_{m,-s}(theta)

    and d^l_{m,2} from the standard Jacobi/factorial sum. Coefficients are
    Python floats (static l, m); only theta is traced. At phi = 0 the value
    is real. Cross-checked in tests against the hand-written l = 2 row of
    gwkit.data.imrphenomp._sYlm_m2_row and the sum rule
    sum_m |sYlm|^2 = (2l+1)/(4 pi).
    """
    # sYlm(theta, 0) for s = -2 is the generic Jacobi sum with m' = m,
    # m = 2 — exactly wigner_d below — scaled by sqrt((2l+1)/4 pi); one
    # implementation of the sum, not two kept in sync by hand.
    half = theta / 2.0
    d = wigner_d(l, m, 2, jnp.cos(half), jnp.sin(half))
    return math.sqrt((2 * l + 1) / (4.0 * math.pi)) * d


def pn_mode_ratio(l: int, m: int, v, eta, delta, pn_amplitude: bool = True):
    """|H_lm / H_22| of the non-spinning PN mode amplitudes.

    Leading order each (Blanchet living-review / Kidder 2008 mode
    amplitudes):
      (2,2): 1
      (2,1): (1/3) delta v
      (3,3): (3/4) sqrt(15/14) delta v
      (3,2): (1/3) sqrt(5/7) (1 - 3 eta) v^2
      (4,4): (8/9) sqrt(10/7) (1 - 3 eta) v^2
    delta = (m1 - m2)/M; v is the orbital velocity at the MODE's mapped
    frequency, v = (pi M (2 f / m))^(1/3).

    ``pn_amplitude`` (default) multiplies the odd-m ratios by the
    relative-PN amplitude series of the modulus through O(v^3)
    (Blanchet-Faye-Iyer-Sinha 2008 / Kidder 2008 eq. 80; the O(v^3)
    imaginary parts only enter the modulus at O(v^6) and are dropped):

      hat-H_22 = 1 + v^2 (-107/42 + 55 eta/42) + 2 pi v^3
      hat-H_21 = 1 + v^2 (-17/28 + 5 eta/7)    +   pi v^3
      hat-H_33 = 1 + v^2 (-4 + 2 eta)          + 3 pi v^3

    so ratio_lm *= |hat-H_lm| / |hat-H_22|. The (3,2)/(4,4) relative-1PN
    coefficients ((-193/90 + 145 eta/18 - 73 eta^2/18) and (-593/110 +
    1273 eta/66 - 175 eta^2/22) over (1 - 3 eta)) are large and negative —
    the truncated series crosses zero mid-inspiral (v ~ 0.45-0.48 across
    the challenge mass range), which models that calibrate to it repair
    with NR-fitted pseudo-PN terms (e.g. PhenomXHM's inspiral amplitude);
    with no NR data available those two modes deliberately stay at leading
    order rather than inheriting a spurious mid-band null.
    """
    if (l, m) == (2, 2):
        return jnp.ones_like(v)
    corr = 1.0
    if pn_amplitude and m % 2 == 1:
        h22 = 1.0 + v ** 2 * (-107.0 / 42.0 + 55.0 * eta / 42.0) \
            + 2.0 * math.pi * v ** 3
        if (l, m) == (2, 1):
            hlm = 1.0 + v ** 2 * (-17.0 / 28.0 + 5.0 * eta / 7.0) \
                + math.pi * v ** 3
        else:  # (3, 3)
            hlm = 1.0 + v ** 2 * (-4.0 + 2.0 * eta) + 3.0 * math.pi * v ** 3
        corr = jnp.abs(hlm) / jnp.maximum(jnp.abs(h22), 0.3)
    if (l, m) == (2, 1):
        return (1.0 / 3.0) * delta * v * corr
    if (l, m) == (3, 3):
        return 0.75 * math.sqrt(15.0 / 14.0) * delta * v * corr
    if (l, m) == (3, 2):
        return (1.0 / 3.0) * math.sqrt(5.0 / 7.0) * (1.0 - 3.0 * eta) * v ** 2
    if (l, m) == (4, 4):
        return (8.0 / 9.0) * math.sqrt(10.0 / 7.0) * (1.0 - 3.0 * eta) * v ** 2
    raise ValueError(f"mode ({l},{m}) not modeled")


#: Constant phase of the leading complex PN amplitude H_lm relative to the
#: (real, positive) leading H_22: H_21 = +i|.|, H_33 = -i|.|, H_32 = +|.|,
#: H_44 = -|.| — the relative mode phasing that shapes the combined
#: waveform's morphology.
MODE_PHASE = {(2, 2): 0.0, (2, 1): 0.5 * math.pi, (3, 3): -0.5 * math.pi,
              (3, 2): 0.0, (4, 4): math.pi}

#: (l,m,0) Kerr QNM fits, Berti/Cardoso/Will 2006 table VIII:
#: omega_R M_f = f1 + f2 (1-a)^f3. Anchored in tests at a = 0 against the
#: exact Schwarzschild frequencies (0.37367 / 0.59944 / 0.80918 for
#: l = 2/3/4, m-independent) to the fits' known ~2% accuracy.
QNM_FITS = {
    (2, 2): (1.5251, -1.1568, 0.1292),
    (2, 1): (0.6000, -0.2339, 0.4175),
    (3, 3): (1.8956, -1.3043, 0.1818),
    (3, 2): (1.1481, -0.5552, 0.3002),
    (4, 4): (2.3000, -1.5056, 0.2244),
}


def qnm_frequency_lm(l: int, m: int, final_a, erad):
    """Mode ringdown frequency Mf_RD(l,m) in INITIAL-total-mass units.

    Same convention as gwkit.data.imrphenomd.qnm_ringdown (the (2,2) row of
    QNM_FITS is that function's fit): remnant-mass geometric frequency
    scaled by 1/(1 - E_rad)."""
    c1, c2, c3 = QNM_FITS[(l, m)]
    a = jnp.clip(final_a, -0.999, 0.999)
    omega = c1 + c2 * (1.0 - a) ** c3
    return omega / (2.0 * jnp.pi * (1.0 - erad))


def _mode_freq_map(mf, l, m, coeffs, f_rdlm):
    """PhenomHM three-region map F(mf): lm-mode geometric frequency ->
    equivalent (2,2) geometric frequency (London et al. 2018 eq. 5-13
    structure).

    inspiral  (mf <= (m/2) Mf_ins):   F = (2/m) mf       (shared orbit)
    ringdown  (mf >= Mf_RDlm):        F = kappa mf,  kappa = Mf_RD22/Mf_RDlm
                                      (lands the mode's ringdown on its own
                                      QNM frequency)
    intermediate:                     linear, C0 at both boundaries.

    For (2,2) every region reduces to the identity (kappa = 1), so the
    mapped model is EXACTLY PhenomD for the dominant mode. Returns
    (F, f1, a_int, kappa) — the boundaries/slopes the phase stitching needs.
    """
    from gwkit.data.imrphenomd import PHI_F_JOIN_INS

    f_ins22 = PHI_F_JOIN_INS
    f1 = (m / 2.0) * f_ins22
    f_rd22 = coeffs.f_rd
    kappa = f_rd22 / f_rdlm
    a_int = (f_rd22 - f_ins22) / (f_rdlm - f1)
    b_int = f_ins22 - a_int * f1
    f_map = jnp.where(
        mf <= f1, (2.0 / m) * mf,
        jnp.where(mf < f_rdlm, a_int * mf + b_int, kappa * mf))
    return f_map, f1, a_int, kappa


def phenomhm_modes(
    freqs: jnp.ndarray,
    m1,
    m2,
    chi1,
    chi2,
    distance_mpc,
    tc=0.0,
    phic=0.0,
    f_lower: float = 20.0,
    modes: Sequence[Tuple[int, int]] = DEFAULT_MODES,
    ringdown_map: bool = True,
):
    """dict {(l, m): h_lm(f)} of positive-m FD modes (SPA, h = A e^{-i psi}).

    Each mode is PhenomD's (2,2) re-evaluated at the mapped frequency
    F(f): with ``ringdown_map`` (default) the PhenomHM three-region map of
    :func:`_mode_freq_map` — (2/m) f through the inspiral, per-mode-QNM
    scaled through ringdown, linear between — with the phase C1-stitched
    across regions by per-region time/phase constants (the same stitching
    pattern PhenomD itself uses across its own regions); with
    ``ringdown_map=False`` the pure leading-order (2/m) f map everywhere.

    psi_lm = 2 pi f tc - (m/2) phic - pi/4 + (m/2) phi_22(F(f)) [+ stitch]
    and A_lm = sqrt(2/m) |H_lm/H_22|(v) A_22(F(f)) with v capped at the
    22 amplitude peak (the leading PN ratio is an inspiral quantity). The
    band mask keeps orbital content from the same start: support begins at
    (m/2) f_lower — the (3,3) mode of a binary entering at 20 Hz has
    support from 30 Hz.
    """
    import jax

    from gwkit.data import imrphenomd

    mtot_s = (m1 + m2) * MTSUN_SI
    eta = (m1 * m2) / (m1 + m2) ** 2
    delta = jnp.abs(m1 - m2) / (m1 + m2)
    mc_s = ((m1 * m2) ** (3.0 / 5.0) / (m1 + m2) ** (1.0 / 5.0)) * MTSUN_SI
    d_s = distance_mpc * MPC_SI / C_SI
    coeffs = imrphenomd.phenomd_coeffs(eta, chi1, chi2)
    af = imrphenomd.final_spin(eta, chi1, chi2)
    erad = imrphenomd.radiated_energy(eta, chi1, chi2)
    v_peak = (jnp.pi * imrphenomd._amp_peak_freq(coeffs)) ** (1.0 / 3.0)
    dphi22 = jax.grad(lambda x: imrphenomd.phenomd_phase(x, coeffs))
    mf = mtot_s * jnp.maximum(freqs, 1e-3)  # output-grid geometric frequency
    # loop-invariant phase-derivative anchors for the C1 stitching below
    # (identical for every mode; hoisted so jax.grad traces once, not 5x)
    dp_f1 = dphi22(jnp.asarray(imrphenomd.PHI_F_JOIN_INS, mf.dtype))
    dp_rd = dphi22(coeffs.f_rd)

    out = {}
    for (l, m) in modes:
        scale = 2.0 / m
        half_m = m / 2.0
        if ringdown_map:
            f_rdlm = qnm_frequency_lm(l, m, af, erad)
            f_map, fb1, a_int, kappa = _mode_freq_map(mf, l, m, coeffs, f_rdlm)
            # C1 stitching: per-region linear-in-f (time shift) + constant
            # (phase shift) so value AND derivative are continuous at both
            # boundaries. Region-1 derivative is phi22'(F) * (2/m) * (m/2)
            # = phi22' — the shared-orbit inspiral needs no correction.
            tau2 = (1.0 - half_m * a_int) * dp_f1
            c2 = -tau2 * fb1
            tau3 = half_m * a_int * dp_rd + tau2 - half_m * kappa * dp_rd
            c3 = c2 + (tau2 - tau3) * f_rdlm
            stitch = jnp.where(
                mf <= fb1, 0.0,
                jnp.where(mf < f_rdlm, tau2 * mf + c2, tau3 * mf + c3))
            mf_cut = imrphenomd.F_CUT / kappa
        else:
            f_map = scale * mf
            stitch = 0.0
            mf_cut = imrphenomd.F_CUT / scale
        ampc = imrphenomd.phenomd_amplitude(f_map, coeffs)
        phase = half_m * imrphenomd.phenomd_phase(f_map, coeffs) + stitch
        carrier = (
            jnp.sqrt(5.0 / 24.0)
            * jnp.pi ** (-2.0 / 3.0)
            * mc_s ** (5.0 / 6.0)
            / d_s
            * (f_map / mtot_s) ** (-7.0 / 6.0)
        )
        v = jnp.minimum((jnp.pi * f_map) ** (1.0 / 3.0), v_peak)
        ratio = pn_mode_ratio(l, m, v, eta, delta)
        # carrier*ampc is the ALIGNED-h convention of waveforms.phenomd_h22
        # (hp = h (1+c^2)/2); the true (2,2) mode amplitude is
        # h / (2 Y0) with Y0 = sqrt(5/(64 pi)) — same conversion as the
        # PhenomP twist (gwkit/data/imrphenomp.py h_p22 normalization).
        mode_units = 1.0 / (2.0 * math.sqrt(5.0 / (64.0 * math.pi)))
        amp = mode_units * math.sqrt(scale) * ratio * carrier * ampc
        band = (freqs >= half_m * f_lower) & (mf <= mf_cut)
        psi = (2.0 * jnp.pi * freqs * tc - half_m * phic - jnp.pi / 4.0
               + phase - MODE_PHASE[(l, m)])
        out[(l, m)] = jnp.where(band, amp, 0.0) * jnp.exp(-1j * psi)
    return out


def phenomhm_hplus_hcross(
    freqs: jnp.ndarray,
    m1,
    m2,
    chi1,
    chi2,
    distance_mpc,
    inclination,
    tc=0.0,
    phic=0.0,
    f_lower: float = 20.0,
    modes: Sequence[Tuple[int, int]] = DEFAULT_MODES,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned-spin FD polarizations with higher harmonics.

    Same conventions as gwkit.data.waveforms.phenomd_hplus_hcross (which it
    reproduces exactly at modes=((2,2),); tested). ``phic`` enters each mode
    as (m/2) phic — the orbital coalescence phase, matching the dominant
    mode's convention. Reference capability: lalsuite IMRPhenomXPHM's
    higher-multipole content, MLGWSC-1/gen.py:131-147.
    """
    hlms = phenomhm_modes(freqs, m1, m2, chi1, chi2, distance_mpc,
                          tc, phic, f_lower, modes)
    theta = jnp.asarray(inclination)
    hp = jnp.zeros(jnp.shape(freqs), jnp.complex64)
    hc = jnp.zeros(jnp.shape(freqs), jnp.complex64)
    for (l, m), hlm in hlms.items():
        yp = sylm(l, m, theta)
        ym = sylm(l, -m, theta)  # real at phi=0, so conj(Y) = Y
        sym = (-1.0) ** l
        hp = hp + 0.5 * hlm * (yp + sym * ym)
        hc = hc + 0.5j * hlm * (yp - sym * ym)
    return hp, hc


def wigner_d(l: int, mp: int, m: int, cos_half, sin_half) -> jnp.ndarray:
    """Wigner small-d d^l_{mp,m}(beta) from half-angle cos/sin (traced).

    Standard Jacobi sum; coefficients are Python floats (static l, mp, m).
    The sylm Goldberg sum above is this with m = 2 — cross-checked in tests
    against gwkit.data.imrphenomp._wigner_d2_row and the row sum rule
    sum_mp d^2 = 1 (rotations move power between multipoles, never create it).
    """
    fact = math.factorial
    norm = math.sqrt(fact(l + mp) * fact(l - mp) * fact(l + m) * fact(l - m))
    out = jnp.zeros_like(cos_half)
    for k in range(max(0, m - mp), min(l + m, l - mp) + 1):
        denom = fact(l + m - k) * fact(k) * fact(mp - m + k) * fact(l - mp - k)
        coef = ((-1.0) ** (mp - m + k)) * norm / denom
        out = out + (coef * cos_half ** (2 * l + m - mp - 2 * k)
                     * sin_half ** (mp - m + 2 * k))
    return out


def xphm_hplus_hcross(
    freqs: jnp.ndarray,
    m1,
    m2,
    chi1z,
    chi2z,
    chip,
    distance_mpc,
    inclination,
    tc=0.0,
    phic=0.0,
    alpha0=0.0,
    f_lower: float = 20.0,
    modes: Sequence[Tuple[int, int]] = DEFAULT_MODES,
    angle_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precessing FD polarizations WITH higher harmonics (XPHM capability).

    The PhenomP twist of gwkit.data.imrphenomp generalized to every carried
    mode: each co-precessing (l, m) from :func:`phenomhm_modes` is rotated
    into the inertial frame through the same leading-order Euler angles
    (alpha, beta, epsilon), evaluated at the mode's mapped 22-equivalent
    frequency (2/m) f (all modes share one orbital precession history), via
    the full Wigner row d^l_{m',+-m}:

      h+ - i hx  +=  0.5 h_lm e^{i m eps} sum_m' Y_lm' [ e^{-i m' alpha}
          d^l_{m',m}  +-  (-1)^l e^{+i m' alpha} d^l_{m',-m} ]

    (+ for h+ with the 1/2 front factor, the (-1)^l carrying the aligned
    equatorial symmetry h_{l,-m} = (-1)^l conj(h_lm)). Exact reductions,
    both tested: chip = 0 reproduces phenomhm_hplus_hcross identically;
    modes = ((2,2),) reproduces imrphenomp.phenomp_hplus_hcross identically.
    Reference capability: lalsuite IMRPhenomXPHM (MLGWSC-1/gen.py:131-147);
    same validation boundary as the single-mode twist (module docstring of
    gwkit.data.imrphenomp). ``angle_fn`` swaps the leading-order closed-form
    angles for a caller-supplied model (e.g. the two-spin ODE integration in
    gwkit.data.precession_ode); when given, ``chip``/``alpha0`` only feed
    the default path and are ignored.
    """
    from gwkit.data.imrphenomp import precession_angles

    hlms = phenomhm_modes(freqs, m1, m2, chi1z, chi2z, distance_mpc,
                          tc, phic, f_lower, modes)
    mtot = m1 + m2
    s_z = (chi1z * m1 ** 2 + chi2z * m2 ** 2) / mtot ** 2
    theta = jnp.asarray(inclination)
    hp = jnp.zeros(jnp.shape(freqs), jnp.complex64)
    hc = jnp.zeros(jnp.shape(freqs), jnp.complex64)
    for (l, m), hlm in hlms.items():
        f_r = (2.0 / m) * jnp.maximum(freqs, 1e-3)
        if angle_fn is not None:
            # the same orbital precession history serves every mode,
            # evaluated at its (2/m)-mapped 22-equivalent frequency
            alpha, cos_b, eps = angle_fn(f_r)
        else:
            alpha, cos_b, eps = precession_angles(
                f_r, m1, m2, s_z, chip, alpha0, f_ref=f_lower)
        # half-angle forms for the generic Wigner row (beta in [0, pi])
        ch = jnp.sqrt(jnp.maximum((1.0 + cos_b) / 2.0, 0.0))
        sh = jnp.sqrt(jnp.maximum((1.0 - cos_b) / 2.0, 0.0))
        sym = (-1.0) ** l
        tw = 0.5 * hlm * jnp.exp(1j * m * eps)
        hp_sum = jnp.zeros_like(alpha, dtype=jnp.complex64)
        hc_sum = jnp.zeros_like(alpha, dtype=jnp.complex64)
        for mp in range(-l, l + 1):
            y = sylm(l, mp, theta)
            phase_mp = jnp.exp(-1j * mp * alpha)
            t_pos = y * phase_mp * wigner_d(l, mp, m, ch, sh)
            t_neg = y * jnp.conj(phase_mp) * wigner_d(l, mp, -m, ch, sh)
            hp_sum = hp_sum + (t_pos + sym * t_neg)
            hc_sum = hc_sum + 1j * (t_pos - sym * t_neg)
        hp = hp + tw * hp_sum
        hc = hc + tw * hc_sum
    return hp, hc
