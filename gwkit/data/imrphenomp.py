"""Precessing-binary FD waveforms: an IMRPhenomP-style "twist" of the
aligned-spin IMRPhenomD co-precessing waveform.

The reference generates challenge datasets 3/4 with lalsuite's
IMRPhenomXPHM (MLGWSC-1/gen.py:131-147); in this zero-egress environment the
precessing content is supplied by the standard twist construction
(Hannam et al. 2014, "PhenomP"): the aligned-spin model plays the role of
the co-precessing-frame (2,2) mode, and frequency-dependent Euler rotations
(alpha, beta, epsilon) mix it into the inertial-frame l=2 multipoles via
Wigner d-matrices and spin-weighted spherical harmonics.

Scope and validation boundary (documented, tested in
tests/test_imrphenomp.py):

* Euler angles are the LEADING-ORDER single-spin (Apostolatos et al. 1994)
  simple-precession solution, not the NNLO PN series of PhenomPv2:
  d(alpha)/dv derived from Omega_p = (2 + 3q/2) |J| / r^3 with Newtonian
  L = eta M^2 / v and quadrupole radiation reaction, giving
  alpha(v) = alpha0 - (5/96)(2 + 3q/2) v^-3 (the well-known -35/192 v^-3
  at equal mass); cos(beta) = (L + S_z) / |J|; epsilon obeys the
  minimal-rotation condition d(eps) = cos(beta) d(alpha) (integrated on the
  static frequency grid).
* In-plane spin enters through the effective precession spin chi_p
  (Schmidt, Ohme & Hannam 2015), placed on the larger body.
* Exact reduction: chi_p = 0 reproduces phenomd_hplus_hcross identically
  (tested); the Wigner row satisfies sum_m d^2_{m,2}^2 = 1 (power moves
  between multipoles, none is created or lost; tested).
* No external waveform oracle (lalsuite) exists in this environment, so
  the twist's absolute phase conventions are pinned by the aligned limit
  rather than by cross-validation against IMRPhenomXPHM; higher modes of
  the co-precessing frame (l>2, |m|!=2) are not twisted here — the
  ALIGNED higher-harmonic content lives in gwkit.data.higher_modes
  (approximant 'imrphenomhm'), which together with this module covers
  XPHM's two effects separately.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Single-sourced from waveforms: a hand-copied 4.925491e-6 here once
# diverged from the derived value by 2.1e-4 — exactly the phase-visible
# mismatch higher_modes.py warns about — so the precessing twist mixed two
# mass-in-seconds constants (carrier phase vs Euler angles).
from gwkit.data.waveforms import MTSUN_SI  # re-exported: precession_ode imports it


def chi_p(m1, m2, s1x, s1y, s2x, s2y):
    """Effective precession spin (Schmidt et al. 2015, eq. 3.3-3.4).

    m1 >= m2 is assumed (callers sort); A1 = 2 + 3q/2, A2 = 2 + 3/(2q)
    with q = m2/m1 <= 1; chi_p = max(A1 S1_perp, A2 S2_perp) / (A1 m1^2).
    """
    q = m2 / m1
    a1 = 2.0 + 1.5 * q
    a2 = 2.0 + 1.5 / q
    s1_perp = m1 ** 2 * jnp.sqrt(s1x ** 2 + s1y ** 2)
    s2_perp = m2 ** 2 * jnp.sqrt(s2x ** 2 + s2y ** 2)
    return jnp.maximum(a1 * s1_perp, a2 * s2_perp) / (a1 * m1 ** 2)


def precession_angles(
    freqs: jnp.ndarray, m1, m2, chi_eff_z, chip, alpha0=0.0, f_ref: float = 20.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(alpha, cos_beta, epsilon) on the frequency grid (leading order).

    ``chi_eff_z``: total aligned spin S_z/(m1^2) proxy uses the exact sum
    S_z = chi1z m1^2 + chi2z m2^2 passed pre-combined by the caller as
    chi_eff_z = S_z / M^2 (dimensionless). ``chip`` rides the larger body:
    S_perp = chip * m1^2.
    """
    mtot = m1 + m2
    q = m2 / m1
    eta = (m1 * m2) / (mtot ** 2)
    mtot_s = mtot * MTSUN_SI
    # clamp the grid at f_ref/2: bins below f_lower are amplitude-masked
    # anyway, and letting v^-3 blow up at the DC bins would poison the f32
    # epsilon cumsum with ~1e5-rad partial sums
    f_safe = jnp.maximum(freqs, 0.5 * f_ref)
    v = (jnp.pi * mtot_s * f_safe) ** (1.0 / 3.0)
    v_ref = (jnp.pi * mtot_s * f_ref) ** (1.0 / 3.0)

    coef = (5.0 / 96.0) * (2.0 + 1.5 * q)
    alpha = alpha0 - coef * (v ** -3 - v_ref ** -3)

    # opening angle of L around J (dimensionless, M = 1 units)
    ell = eta / v                       # |L| / M^2
    s_z = chi_eff_z                     # S_z / M^2
    s_perp = chip * (m1 / mtot) ** 2    # S_perp / M^2
    cos_beta = (ell + s_z) / jnp.sqrt((ell + s_z) ** 2 + s_perp ** 2)

    # minimal-rotation condition, integrated on the static grid
    dalpha = jnp.diff(alpha, prepend=alpha[..., :1])
    eps = jnp.cumsum(cos_beta * dalpha, axis=-1)
    # gauge: eps(f_ref-ish start) aligned with alpha so the beta->0 limit is
    # exactly phase-free (e^{2i eps} e^{-2i alpha} -> 1)
    eps = eps + (alpha[..., :1] - eps[..., :1])
    return alpha, cos_beta, eps


def _wigner_d2_row(cos_b, sin_b):
    """[d^2_{m,2}(beta) for m = -2..2]; sum of squares is exactly 1."""
    return [
        ((1.0 - cos_b) / 2.0) ** 2,                 # m = -2
        (1.0 - cos_b) / 2.0 * sin_b,                # m = -1
        jnp.sqrt(3.0 / 8.0) * sin_b ** 2,           # m = 0
        (1.0 + cos_b) / 2.0 * sin_b,                # m = +1
        ((1.0 + cos_b) / 2.0) ** 2,                 # m = +2
    ]


def _sYlm_m2_row(theta):
    """[-2Y_{2,m}(theta, 0) for m = -2..2] (Goldberg convention, phi=0)."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    return [
        jnp.sqrt(5.0 / (64.0 * jnp.pi)) * (1.0 - c) ** 2,   # m = -2
        jnp.sqrt(5.0 / (16.0 * jnp.pi)) * s * (1.0 - c),    # m = -1
        jnp.sqrt(15.0 / (32.0 * jnp.pi)) * s ** 2,          # m = 0
        jnp.sqrt(5.0 / (16.0 * jnp.pi)) * s * (1.0 + c),    # m = +1
        jnp.sqrt(5.0 / (64.0 * jnp.pi)) * (1.0 + c) ** 2,   # m = +2
    ]


def phenomp_hplus_hcross(
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
    angle_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precessing FD polarizations on the given grid (PhenomP twist).

    ``inclination`` is the angle between the TOTAL angular momentum and the
    line of sight (theta_JN); ``alpha0`` is the initial precession phase
    (the azimuth of the in-plane spin). chip = 0 reduces exactly to
    :func:`gwkit.data.waveforms.phenomd_hplus_hcross`.

    ``angle_fn`` (optional): a callable ``freqs -> (alpha, cos_beta, eps)``
    replacing the leading-order single-spin closed form — e.g. the two-spin
    numerical model from
    :func:`gwkit.data.precession_ode.precession_angles_numerical`. The
    closed form remains the default (and the challenge generator's default)
    so existing golden vectors are unchanged.
    """
    from gwkit.data.waveforms import phenomd_h22

    h = phenomd_h22(freqs, m1, m2, chi1z, chi2z, distance_mpc, tc, phic, f_lower)
    mtot = m1 + m2
    s_z = (chi1z * m1 ** 2 + chi2z * m2 ** 2) / mtot ** 2
    if angle_fn is not None:
        alpha, cos_b, eps = angle_fn(freqs)
    else:
        alpha, cos_b, eps = precession_angles(
            freqs, m1, m2, s_z, chip, alpha0, f_ref=f_lower)
    sin_b = jnp.sqrt(jnp.maximum(1.0 - cos_b ** 2, 0.0))

    d2 = _wigner_d2_row(cos_b, sin_b)               # d^2_{m,2}
    ys = _sYlm_m2_row(jnp.asarray(inclination))     # -2Y_{2,m}(thetaJN, 0), real
    hp_sum = jnp.zeros_like(alpha, dtype=jnp.complex64)
    hc_sum = jnp.zeros_like(alpha, dtype=jnp.complex64)
    for i, m in enumerate((-2, -1, 0, 1, 2)):
        phase_m = jnp.exp(-1j * m * alpha)
        t_2m = ys[i] * phase_m * d2[i]
        # d^2_{m,-2}(beta) = (-1)^m d^2_{-m,2}(beta); Y row is real at phi=0
        dm2 = ((-1.0) ** m) * d2[4 - i]
        t_m2m = ys[i] * jnp.conj(phase_m) * dm2
        hp_sum = hp_sum + (t_2m + t_m2m)
        hc_sum = hc_sum + 1j * (t_2m - t_m2m)

    # hP normalization from the aligned limit: the aligned generator's
    # carrier h satisfies hp_aligned = h (1+c^2)/2 = 0.5 hP (Y22 + Y2-2)
    # => hP = h / (2 sqrt(5/(64 pi)))
    h_p22 = h / (2.0 * np.sqrt(5.0 / (64.0 * np.pi)))
    tw = 0.5 * h_p22 * jnp.exp(2j * eps)
    return tw * hp_sum, tw * hc_sum
