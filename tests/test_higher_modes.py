"""Physics anchors for the PhenomHM-style higher-mode model.

No waveform oracle (lalsuite) exists in this environment, so the model is
pinned by exact limits and structural identities — the same validation
boundary as gwkit/data/imrphenomd.py and imrphenomp.py (README "Validation
boundary"). Reference capability: IMRPhenomXPHM's higher multipoles,
/root/reference/MLGWSC-1/gen.py:131-147.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gwkit.data.higher_modes import (
    DEFAULT_MODES,
    phenomhm_hplus_hcross,
    phenomhm_modes,
    pn_mode_ratio,
    sylm,
)
from gwkit.data.imrphenomp import _sYlm_m2_row
from gwkit.data.waveforms import phenomd_hplus_hcross

FREQS = jnp.asarray(np.linspace(0.0, 512.0, 4097))


def test_sylm_matches_handwritten_l2_row():
    theta = jnp.asarray(np.linspace(0.05, 3.1, 9))
    row = _sYlm_m2_row(theta)
    for i, m in enumerate((-2, -1, 0, 1, 2)):
        np.testing.assert_allclose(sylm(2, m, theta), row[i], atol=5e-7)


@pytest.mark.parametrize("l", [2, 3, 4])
def test_sylm_sum_rule(l):
    # sum_m |sYlm|^2 = (2l+1)/(4 pi)  (Unsold-type closure for any spin weight)
    theta = jnp.asarray(np.linspace(0.01, 3.13, 11))
    tot = sum(sylm(l, m, theta) ** 2 for m in range(-l, l + 1))
    np.testing.assert_allclose(tot, (2 * l + 1) / (4 * np.pi), rtol=1e-5)


def test_sylm_face_on_selects_m2():
    # at theta = 0 a spin-weight -2 harmonic is nonzero only for m = 2
    for l in (2, 3, 4):
        for m in range(-l, l + 1):
            v = float(sylm(l, m, jnp.asarray(0.0)))
            if m == 2:
                assert abs(v) > 0.1
            else:
                assert abs(v) < 1e-7


def test_22_only_reduces_to_phenomd():
    args = (FREQS, 36.0, 29.0, 0.3, -0.2, 400.0, 0.7)
    hp0, hc0 = phenomd_hplus_hcross(*args)
    hp1, hc1 = phenomhm_hplus_hcross(*args, modes=((2, 2),))
    scale = float(jnp.max(jnp.abs(hp0)))
    assert float(jnp.max(jnp.abs(hp1 - hp0))) < 1e-5 * scale
    assert float(jnp.max(jnp.abs(hc1 - hc0))) < 1e-5 * scale


def test_higher_modes_vanish_at_equal_mass():
    # odd-m amplitudes carry delta = (m1-m2)/M; (3,2)/(4,4) carry (1-3 eta)
    # which is NOT zero at equal mass — only the odd-m modes must vanish.
    hp, hc = phenomhm_hplus_hcross(
        FREQS, 30.0, 30.0, 0.1, 0.1, 400.0, 0.9, modes=((2, 1), (3, 3)))
    assert float(jnp.max(jnp.abs(hp))) == 0.0
    assert float(jnp.max(jnp.abs(hc))) == 0.0


def test_mode_band_and_peak_scaling():
    # leading-order map ((2/m) f everywhere): the (3,3) amplitude peak sits
    # at exactly 1.5x the (2,2)'s on a common grid
    modes = phenomhm_modes(FREQS, 45.0, 15.0, 0.0, 0.0, 400.0,
                           ringdown_map=False)
    # weight out the f^{-7/6} carrier so the argmax tracks the merger
    # amplitude bump, not the band start
    w = jnp.where(FREQS > 1, FREQS ** (7.0 / 6.0), 0.0)
    f22 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(2, 2)]) * w))])
    f33 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(3, 3)]) * w))])
    f44 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(4, 4)]) * w))])
    assert abs(f33 / f22 - 1.5) < 0.05
    assert abs(f44 / f22 - 2.0) < 0.05
    # band start: (3,3) support begins at 1.5 * f_lower
    m33 = np.asarray(jnp.abs(modes[(3, 3)]))
    first = float(FREQS[np.nonzero(m33)[0][0]])
    assert abs(first - 1.5 * 20.0) < 0.5


def test_qnm_map_moves_peaks_past_rescale():
    # with the per-mode QNM ringdown map (default) the (3,3)/(4,4) peaks sit
    # ABOVE the pure (m/2) rescale, at ratios set by the Kerr spectrum
    # (omega_33/omega_22 ~ 1.55-1.65 at moderate final spin)
    modes = phenomhm_modes(FREQS, 45.0, 15.0, 0.0, 0.0, 400.0)
    w = jnp.where(FREQS > 1, FREQS ** (7.0 / 6.0), 0.0)
    f22 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(2, 2)]) * w))])
    f33 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(3, 3)]) * w))])
    f44 = float(FREQS[int(jnp.argmax(jnp.abs(modes[(4, 4)]) * w))])
    assert 1.5 < f33 / f22 < 1.75
    assert 2.0 < f44 / f22 < 2.4


def test_qnm_fits_schwarzschild_anchor():
    # at a = 0 every fit must land on the exact Schwarzschild l-pole
    # frequency (m-independent): within the fits' documented ~2% accuracy
    from gwkit.data.higher_modes import QNM_FITS, qnm_frequency_lm

    exact = {2: 0.37367, 3: 0.59944, 4: 0.80918}
    for (l, m) in QNM_FITS:
        omega = float(qnm_frequency_lm(l, m, 0.0, 0.0)) * 2 * np.pi
        assert abs(omega - exact[l]) / exact[l] < 0.025, (l, m, omega)


def test_qnm_map_structure():
    # the map is continuous, increasing, identity for (2,2), and sends the
    # mode's own ringdown frequency exactly onto the 22's
    from gwkit.data import imrphenomd
    from gwkit.data.higher_modes import _mode_freq_map, qnm_frequency_lm

    eta, c1, c2 = 0.2, 0.3, -0.1
    coeffs = imrphenomd.phenomd_coeffs(eta, c1, c2)
    af = imrphenomd.final_spin(eta, c1, c2)
    erad = imrphenomd.radiated_energy(eta, c1, c2)
    mf = jnp.asarray(np.linspace(1e-4, 0.4, 4001))
    for (l, m) in ((2, 2), (3, 3), (4, 4), (2, 1), (3, 2)):
        f_rdlm = qnm_frequency_lm(l, m, af, erad)
        fmap, _, _, _ = _mode_freq_map(mf, l, m, coeffs, f_rdlm)
        assert bool(jnp.all(jnp.diff(fmap) > 0)), (l, m)
        at_rd = _mode_freq_map(f_rdlm[None], l, m, coeffs, f_rdlm)[0][0]
        np.testing.assert_allclose(float(at_rd), float(coeffs.f_rd), rtol=1e-5)
        if (l, m) == (2, 2):
            np.testing.assert_allclose(np.asarray(fmap), np.asarray(mf), rtol=1e-6)


def test_qnm_map_phase_is_c1_at_boundaries():
    # numerical phase derivative across each region boundary of the (3,3)
    # map shows no jump (the stitching matches value AND derivative)
    from gwkit.data import imrphenomd
    from gwkit.data.higher_modes import MTSUN_SI, qnm_frequency_lm

    m1, m2 = 45.0, 15.0
    mtot_s = (m1 + m2) * MTSUN_SI
    eta = (m1 * m2) / (m1 + m2) ** 2
    af = imrphenomd.final_spin(eta, 0.0, 0.0)
    er = imrphenomd.radiated_energy(eta, 0.0, 0.0)
    boundaries = [1.5 * imrphenomd.PHI_F_JOIN_INS,
                  float(qnm_frequency_lm(3, 3, af, er))]
    for b in boundaries:
        f_hz = b / mtot_s
        grid = jnp.asarray(np.linspace(f_hz * 0.99, f_hz * 1.01, 201))
        h33 = phenomhm_modes(grid, m1, m2, 0.0, 0.0, 400.0)[(3, 3)]
        d1 = np.diff(np.unwrap(np.angle(np.asarray(h33))))
        jump = float(np.max(np.abs(np.diff(d1))))
        slope = float(np.median(np.abs(d1)))
        # floor at 1e-4 rad: f32 quantization of a ~1e5-rad phase dominates
        # any genuine kink well below this
        assert jump < max(0.05 * slope, 1e-4), (b, jump, slope)


def test_pn_hierarchy_ordering():
    # at v ~ 0.3 (mid-inspiral) the subdominant amplitudes follow the PN
    # ordering for an asymmetric binary: 33 > 21, and all << 22
    v = jnp.asarray(0.3)
    eta, delta = 0.1875, 0.5  # q = 3
    r33 = float(pn_mode_ratio(3, 3, v, eta, delta))
    r21 = float(pn_mode_ratio(2, 1, v, eta, delta))
    r44 = float(pn_mode_ratio(4, 4, v, eta, delta))
    assert 0 < r21 < r33 < 1.0
    assert 0 < r44 < 1.0
    # leading-order values (Blanchet LRR): (1/3) delta v, (3/4)sqrt(15/14) delta v
    r21_lo = float(pn_mode_ratio(2, 1, v, eta, delta, pn_amplitude=False))
    r33_lo = float(pn_mode_ratio(3, 3, v, eta, delta, pn_amplitude=False))
    np.testing.assert_allclose(r21_lo, delta * 0.3 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(
        r33_lo, 0.75 * math.sqrt(15.0 / 14.0) * delta * 0.3, rtol=1e-6)


def test_pn_amplitude_corrections():
    """The relative-PN modulus series of the odd-m ratios (pn_mode_ratio
    docstring): -> 1 as v -> 0, match the hand-evaluated series mid-band,
    leave the even-m modes at leading order, and stay finite/positive."""
    eta, delta = 0.1875, 0.5

    # v -> 0: correction factor -> 1 (ratio -> leading order)
    v0 = jnp.asarray(1e-3)
    np.testing.assert_allclose(
        float(pn_mode_ratio(2, 1, v0, eta, delta)),
        float(pn_mode_ratio(2, 1, v0, eta, delta, pn_amplitude=False)),
        rtol=1e-4)

    # mid-band: ratio = leading * |hat-H_lm| / |hat-H_22| with the
    # documented coefficients
    v = 0.35
    h22 = 1.0 + v ** 2 * (-107.0 / 42.0 + 55.0 * eta / 42.0) + 2.0 * math.pi * v ** 3
    h21 = 1.0 + v ** 2 * (-17.0 / 28.0 + 5.0 * eta / 7.0) + math.pi * v ** 3
    h33 = 1.0 + v ** 2 * (-4.0 + 2.0 * eta) + 3.0 * math.pi * v ** 3
    np.testing.assert_allclose(
        float(pn_mode_ratio(2, 1, jnp.asarray(v), eta, delta)),
        (delta * v / 3.0) * abs(h21) / abs(h22), rtol=1e-5)
    np.testing.assert_allclose(
        float(pn_mode_ratio(3, 3, jnp.asarray(v), eta, delta)),
        0.75 * math.sqrt(15.0 / 14.0) * delta * v * abs(h33) / abs(h22),
        rtol=1e-5)

    # even-m modes deliberately stay at leading order (series breakdown,
    # see pn_mode_ratio docstring)
    for lm in ((3, 2), (4, 4)):
        np.testing.assert_allclose(
            float(pn_mode_ratio(*lm, jnp.asarray(v), eta, delta)),
            float(pn_mode_ratio(*lm, jnp.asarray(v), eta, delta,
                                pn_amplitude=False)), rtol=1e-7)

    # finite and positive across the full v range up to a merger-ish cap
    vs = jnp.linspace(0.01, 0.75, 64)
    for lm in ((2, 1), (3, 3)):
        r = np.asarray(pn_mode_ratio(*lm, vs, eta, delta))
        assert np.isfinite(r).all() and (r > 0).all()


def test_hm_contribution_grows_with_asymmetry_and_inclination():
    def hm_frac(m1, m2, incl):
        hp0, _ = phenomd_hplus_hcross(FREQS, m1, m2, 0.0, 0.0, 400.0, incl)
        hp1, _ = phenomhm_hplus_hcross(FREQS, m1, m2, 0.0, 0.0, 400.0, incl)
        return float(jnp.max(jnp.abs(hp1 - hp0)) / jnp.max(jnp.abs(hp0)))

    assert hm_frac(48.0, 12.0, 1.2) > 2.0 * hm_frac(33.0, 27.0, 1.2)
    assert hm_frac(48.0, 12.0, 1.2) > hm_frac(48.0, 12.0, 0.15)


def test_all_default_modes_finite_and_bounded():
    hp, hc = phenomhm_hplus_hcross(FREQS, 48.0, 12.0, 0.5, -0.3, 100.0, 2.0,
                                   tc=3.0, phic=1.1, modes=DEFAULT_MODES)
    assert bool(jnp.all(jnp.isfinite(hp))) and bool(jnp.all(jnp.isfinite(hc)))
    hp0, _ = phenomd_hplus_hcross(FREQS, 48.0, 12.0, 0.5, -0.3, 100.0, 2.0,
                                  tc=3.0, phic=1.1)
    # higher modes perturb, not dominate: total within 50% of the 22-only peak
    assert float(jnp.max(jnp.abs(hp))) < 1.5 * float(jnp.max(jnp.abs(hp0)))


class TestXPHM:
    """Precession twist x higher harmonics (gwkit.data.higher_modes.xphm_*)."""

    def test_wigner_d_matches_handwritten_l2_row(self):
        from gwkit.data.higher_modes import wigner_d
        from gwkit.data.imrphenomp import _wigner_d2_row

        cb = jnp.asarray(np.linspace(-0.99, 0.99, 7))
        sb = jnp.sqrt(1 - cb ** 2)
        ch, sh = jnp.sqrt((1 + cb) / 2), jnp.sqrt((1 - cb) / 2)
        row = _wigner_d2_row(cb, sb)
        for i, mp in enumerate((-2, -1, 0, 1, 2)):
            np.testing.assert_allclose(wigner_d(2, mp, 2, ch, sh), row[i], atol=5e-7)

    @pytest.mark.parametrize("lm", [(3, 3), (3, 2), (4, 4), (2, 1)])
    def test_wigner_row_sum_rule(self, lm):
        # sum_m' d^l_{m',m}^2 = 1: the rotation moves power between
        # multipoles, never creates it
        from gwkit.data.higher_modes import wigner_d

        l, m = lm
        cb = jnp.asarray(np.linspace(-0.99, 0.99, 9))
        ch, sh = jnp.sqrt((1 + cb) / 2), jnp.sqrt((1 - cb) / 2)
        tot = sum(wigner_d(l, mp, m, ch, sh) ** 2 for mp in range(-l, l + 1))
        np.testing.assert_allclose(tot, 1.0, atol=2e-6)

    def test_chip_zero_reduces_to_phenomhm(self):
        from gwkit.data.higher_modes import xphm_hplus_hcross

        hp0, hc0 = phenomhm_hplus_hcross(FREQS, 40.0, 15.0, 0.3, -0.2, 400.0, 1.1)
        hp1, hc1 = xphm_hplus_hcross(FREQS, 40.0, 15.0, 0.3, -0.2, 0.0, 400.0, 1.1)
        s = float(jnp.max(jnp.abs(hp0)))
        assert float(jnp.max(jnp.abs(hp1 - hp0))) < 1e-4 * s
        assert float(jnp.max(jnp.abs(hc1 - hc0))) < 1e-4 * s

    def test_22_only_reduces_to_phenomp(self):
        from gwkit.data.higher_modes import xphm_hplus_hcross
        from gwkit.data.imrphenomp import phenomp_hplus_hcross

        a = (FREQS, 40.0, 15.0, 0.3, -0.2, 0.4, 400.0, 1.1)
        hp0, hc0 = phenomp_hplus_hcross(*a, alpha0=0.7)
        hp1, hc1 = xphm_hplus_hcross(*a, alpha0=0.7, modes=((2, 2),))
        s = float(jnp.max(jnp.abs(hp0)))
        assert float(jnp.max(jnp.abs(hp1 - hp0))) < 1e-4 * s
        assert float(jnp.max(jnp.abs(hc1 - hc0))) < 1e-4 * s

    def test_full_finite_and_td_synthesis(self):
        from gwkit.data.waveforms import td_polarizations

        params = {
            "mass1": np.array([40.0]),
            "mass2": np.array([15.0]),
            "distance": np.array([400.0]),
            "inclination": np.array([1.1]),
            "tc": np.array([6.0]),
            "coa_phase": np.array([0.4]),
            "spin1z": np.array([0.3]),
            "spin2z": np.array([-0.2]),
            "chi_p": np.array([0.6]),
            "alpha0": np.array([0.3]),
        }
        hp, hc = td_polarizations(params, 8.0, 2048.0, approximant="imrphenomxphm")
        assert bool(jnp.all(jnp.isfinite(hp))) and bool(jnp.all(jnp.isfinite(hc)))
        hp_p, _ = td_polarizations(params, 8.0, 2048.0, approximant="imrphenomp")
        # precession+HM differs from the single-mode twist for this system
        assert float(jnp.max(jnp.abs(hp - hp_p))) > 1e-3 * float(jnp.max(jnp.abs(hp_p)))

    def test_challenge_ds34_uses_xphm(self):
        from gwkit.data.generate import challenge_distribution

        assert challenge_distribution(3).approximant == "imrphenomxphm"
        assert challenge_distribution(4).approximant == "imrphenomxphm"


def test_td_synthesis_approximant():
    from gwkit.data.waveforms import td_polarizations

    params = {
        "mass1": np.array([40.0, 25.0]),
        "mass2": np.array([12.0, 24.0]),
        "distance": np.array([400.0, 700.0]),
        "inclination": np.array([1.1, 0.3]),
        "tc": np.array([6.0, 6.0]),
        "coa_phase": np.array([0.0, 2.0]),
        "spin1z": np.array([0.3, -0.1]),
        "spin2z": np.array([0.0, 0.2]),
    }
    hp, hc = td_polarizations(params, 8.0, 2048.0, approximant="imrphenomhm")
    hp0, hc0 = td_polarizations(params, 8.0, 2048.0, approximant="imrphenomd")
    assert hp.shape == (2, 16384) and bool(jnp.all(jnp.isfinite(hp)))
    # the asymmetric system differs visibly from 22-only; the near-equal-mass
    # face-on-ish one barely does
    d0 = float(jnp.max(jnp.abs(hp[0] - hp0[0])) / jnp.max(jnp.abs(hp0[0])))
    d1 = float(jnp.max(jnp.abs(hp[1] - hp0[1])) / jnp.max(jnp.abs(hp0[1])))
    assert d0 > 0.03 and d1 < d0
