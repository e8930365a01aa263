"""PhenomP-style precession twist: aligned-limit exactness, Wigner/harmonic
identities, chi_p conventions, and physical modulation behavior.

No external waveform oracle (lalsuite) exists in this environment, so the
twist is pinned by (a) the exact chi_p = 0 reduction to IMRPhenomD, (b) the
sum rules its rotation algebra must satisfy, and (c) qualitative precession
physics (amplitude modulation growing with chi_p). The module docstring of
gwkit.data.imrphenomp states this validation boundary.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gwkit.data.imrphenomp import (
    _sYlm_m2_row,
    _wigner_d2_row,
    chi_p,
    phenomp_hplus_hcross,
    precession_angles,
)
from gwkit.data.waveforms import phenomd_hplus_hcross

FREQS = np.linspace(0.0, 1024.0, 8193)  # 16 s @ 2048 Hz rfft grid


def test_wigner_row_sum_of_squares_is_one():
    beta = np.linspace(0.0, np.pi, 101)
    row = _wigner_d2_row(jnp.cos(beta), jnp.sin(beta))
    total = sum(np.asarray(d) ** 2 for d in row)
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)


def test_spin_weighted_harmonics_sum_rule():
    """sum_m |_{-2}Y_{2m}|^2 = (2l+1)/(4 pi) = 5/(4 pi), for every theta."""
    theta = np.linspace(0.0, np.pi, 101)
    row = _sYlm_m2_row(jnp.asarray(theta))
    total = sum(np.asarray(y) ** 2 for y in row)
    np.testing.assert_allclose(total, 5.0 / (4.0 * np.pi), rtol=1e-6)


def test_chi_p_single_spin_conventions():
    # in-plane spin only on the larger body: chi_p is its perp magnitude
    np.testing.assert_allclose(float(chi_p(30.0, 15.0, 0.3, 0.4, 0.0, 0.0)), 0.5, rtol=1e-6)
    # no in-plane spin: zero
    assert float(chi_p(30.0, 15.0, 0.0, 0.0, 0.0, 0.0)) == 0.0
    # spin on the smaller body is A2/(A1) m2^2/m1^2 suppressed
    got = float(chi_p(30.0, 15.0, 0.0, 0.0, 0.6, 0.0))
    q = 0.5
    expect = (2.0 + 1.5 / q) * (15.0 ** 2 * 0.6) / ((2.0 + 1.5 * q) * 30.0 ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.parametrize("incl", [0.0, 0.7, 1.5708, 2.5])
@pytest.mark.parametrize("chi1z", [0.0, 0.4])
def test_aligned_limit_reduces_to_phenomd(incl, chi1z):
    """chi_p = 0 must reproduce phenomd_hplus_hcross exactly (same grid,
    masses, aligned spins, distance, inclination, tc, phic)."""
    f = jnp.asarray(FREQS)
    args = dict(m1=36.0, m2=29.0, distance_mpc=410.0, inclination=incl,
                tc=12.0, phic=0.9, f_lower=20.0)
    hp0, hc0 = phenomd_hplus_hcross(f, chi1=chi1z, chi2=-0.2, **args)
    hp1, hc1 = phenomp_hplus_hcross(f, chi1z=chi1z, chi2z=-0.2, chip=0.0, **args)
    # absolute floor at 1e-4 of the waveform scale: at inclination ~ pi/2 the
    # cross polarization is a catastrophic cancellation of ~equal f32 terms
    atol = 1e-4 * float(np.abs(np.asarray(hp0)).max())
    np.testing.assert_allclose(np.asarray(hp1), np.asarray(hp0), rtol=2e-5, atol=atol)
    np.testing.assert_allclose(np.asarray(hc1), np.asarray(hc0), rtol=2e-5, atol=atol)


def test_precession_angles_physics():
    """alpha monotonically increases with f (v^-3 decreases, sign fixed);
    cos_beta in (0, 1], shrinking toward merger (L decays); epsilon tracks
    alpha exactly when beta = 0."""
    f = jnp.asarray(FREQS[160:])  # in-band
    alpha, cos_b, eps = precession_angles(f, 36.0, 29.0, 0.1, 0.5)
    a = np.asarray(alpha)
    assert (np.diff(a) > 0).all()
    cb = np.asarray(cos_b)
    assert (cb > 0).all() and (cb <= 1.0).all()
    assert cb[-1] < cb[0]  # opening angle grows as L shrinks
    a0, _, e0 = precession_angles(f, 36.0, 29.0, 0.1, 0.0)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(a0), rtol=1e-5, atol=1e-5)


def test_precession_modulates_amplitude():
    """Finite chi_p imprints amplitude modulation on hp at fixed inclination
    — the in-band amplitude envelope picks up structure absent for chi_p=0,
    and the modulation depth grows with chi_p."""
    f = jnp.asarray(FREQS)
    kw = dict(m1=40.0, m2=10.0, chi1z=0.0, chi2z=0.0, distance_mpc=400.0,
              inclination=1.2, tc=12.0, phic=0.0, f_lower=20.0)

    def mod_depth(chip):
        hp, _ = phenomp_hplus_hcross(f, chip=chip, **kw)
        band = slice(200, 2400)  # 25-300 Hz
        amp = np.abs(np.asarray(hp))[band]
        base = np.abs(np.asarray(phenomp_hplus_hcross(f, chip=0.0, **kw)[0]))[band]
        ratio = amp / np.maximum(base, 1e-40)
        return ratio.max() - ratio.min()

    d_small, d_big = mod_depth(0.2), mod_depth(0.8)
    assert d_small > 0.01, "expected visible modulation at chi_p=0.2"
    assert d_big > d_small, "modulation depth should grow with chi_p"


def test_twist_conserves_multipole_power():
    """The rotation moves power between l=2 multipoles without creating it:
    summed over an inclination grid (orientation average), total |hp|^2 +
    |hc|^2 of the precessing waveform stays within a few percent of the
    aligned waveform's (exact invariance holds for the full sphere +
    polarization average; the grid keeps the test cheap)."""
    f = jnp.asarray(FREQS[::8])
    kw = dict(m1=35.0, m2=20.0, distance_mpc=500.0, tc=12.0, phic=0.3, f_lower=20.0)
    thetas = np.arccos(np.linspace(-0.999, 0.999, 24))  # uniform in cos
    tot_p, tot_a = 0.0, 0.0
    for th in thetas:
        hp, hc = phenomp_hplus_hcross(f, chi1z=0.1, chi2z=0.0, chip=0.7,
                                      inclination=float(th), **kw)
        # rescale before squaring: |h| ~ 1e-23 and |h|^2 underflows f32
        tot_p += float(jnp.sum(jnp.abs(hp * 1e22) ** 2 + jnp.abs(hc * 1e22) ** 2))
        hp0, hc0 = phenomd_hplus_hcross(f, chi1=0.1, chi2=0.0, inclination=float(th), **kw)
        tot_a += float(jnp.sum(jnp.abs(hp0 * 1e22) ** 2 + jnp.abs(hc0 * 1e22) ** 2))
    assert abs(tot_p / tot_a - 1.0) < 0.05, (tot_p, tot_a)
