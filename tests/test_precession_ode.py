"""Two-spin numerical precession angles: conservation laws, limits, and the
genuine two-spin effect the closed-form chi_p model cannot carry.

No lalsuite oracle exists here (module docstring of gwkit.data.imrphenomp
states the validation boundary), so the ODE model is pinned by its exact
invariants instead: |S_i| conservation, J-direction stability over the
inspiral band, the aligned reduction, agreement with the closed-form
leading-order alpha rate in the regime where that form is valid, and exact
chi_p = 0 twist reduction when driven through ``angle_fn``.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gwkit.data.imrphenomp import phenomp_hplus_hcross, precession_angles
from gwkit.data.precession_ode import (
    integrate_precession,
    precession_angles_numerical,
)

FREQS = np.linspace(0.0, 1024.0, 8193)  # 16 s @ 2048 Hz rfft grid


def test_spin_magnitudes_conserved_through_merger_band():
    v, l, s1, s2 = integrate_precession(
        36.0, 29.0, [0.5, 0.0, 0.3], [0.0, 0.4, -0.2], 20.0, 1024.0)
    n1 = np.linalg.norm(np.asarray(s1), axis=1)
    n2 = np.linalg.norm(np.asarray(s2), axis=1)
    np.testing.assert_allclose(n1, n1[0], rtol=1e-5)
    np.testing.assert_allclose(n2, n2[0], rtol=1e-5)
    # Lhat stays unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(l), axis=1), 1.0, rtol=1e-5)


def test_j_direction_stable_over_inspiral():
    """Simple precession: Jhat wanders by < 1 degree while v < 0.4. It
    drifts more later — radiation reaction shrinks |L| so Jhat genuinely
    tilts toward the residual total spin (measured: ~1.6 deg by v = 0.5,
    ~7 deg by v = 1) — that is physics, not integrator error; the
    integrator-error proxies are the |S_i| and |Lhat| norms above."""
    v, l, s1, s2 = integrate_precession(
        36.0, 29.0, [0.4, 0.0, 0.2], [0.0, 0.3, -0.1], 20.0, 1024.0)
    v = np.asarray(v)
    eta = 36.0 * 29.0 / 65.0 ** 2
    J = (eta / v)[:, None] * np.asarray(l) + np.asarray(s1) + np.asarray(s2)
    Jh = J / np.linalg.norm(J, axis=1, keepdims=True)
    band = v < 0.4
    cosang = np.clip((Jh[band] * Jh[0]).sum(axis=1), -1.0, 1.0)
    assert np.degrees(np.arccos(cosang)).max() < 1.0


def test_aligned_limit_is_exactly_frozen():
    fn = precession_angles_numerical(
        36.0, 29.0, [0.0, 0.0, 0.4], [0.0, 0.0, -0.1], alpha0=0.7)
    a, cb, e = fn(jnp.asarray(FREQS))
    np.testing.assert_allclose(np.asarray(a), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), 0.7, atol=1e-6)


def test_alpha_rate_matches_leading_order_single_spin():
    """For one small in-plane spin on the larger body and a light companion,
    d(alpha)/dv from the ODE must track the closed form's
    -(5/96)(2+3q/2) d(v^-3)/dv leading-order rate in the early inspiral."""
    m1, m2 = 40.0, 10.0
    chip = 0.05
    fn = precession_angles_numerical(
        m1, m2, [chip, 0.0, 0.0], [0.0, 0.0, 0.0], alpha0=0.0)
    f = jnp.asarray(FREQS)
    a_num, _, _ = fn(f)
    a_lo, _, _ = precession_angles(f, m1, m2, 0.0, chip, 0.0, f_ref=20.0)
    # compare the accumulated alpha over an early-inspiral window
    lo_band = (FREQS > 22.0) & (FREQS < 40.0)
    da_num = np.diff(np.asarray(a_num)[lo_band])
    da_lo = np.diff(np.asarray(a_lo)[lo_band])
    ratio = da_num.sum() / da_lo.sum()
    assert 0.9 < ratio < 1.1, ratio


def test_alpha_converged_at_default_resolution():
    """The default 384-step solve must agree with a 16x-oversampled
    reference to a few mrad across the band — INCLUDING the low-total-mass
    corner (4+4, 5+3 Msun) where the old uniform-v grid under-resolved
    early precession badly enough to alias the azimuth unwrap (errors of
    1-2 RADIANS). The u = v^-3 grid subtends ~constant alpha per step."""
    freqs = jnp.linspace(20.0, 1024.0, 1500)
    for m1, m2 in ((5.0, 3.0), (4.0, 4.0), (7.0, 7.0)):
        a = precession_angles_numerical(m1, m2, [0.6, 0.0, 0.3],
                                        [0.0, 0.0, 0.0])(freqs)[0]
        ref = precession_angles_numerical(m1, m2, [0.6, 0.0, 0.3],
                                          [0.0, 0.0, 0.0],
                                          n_steps=6144)(freqs)[0]
        total = float(jnp.abs(ref[-1] - ref[0]))
        err = float(jnp.max(jnp.abs(a - ref)))
        assert total > 10.0  # dozens of precession radians in band
        assert err < 0.02, (m1, m2, err)


def test_two_spin_effect_exists():
    """In-plane spin on the SMALLER body changes the numerical angles even
    at fixed chi_p — the scalar-chi_p closed form cannot represent this."""
    f = jnp.asarray(FREQS)
    base = precession_angles_numerical(
        36.0, 29.0, [0.3, 0.0, 0.2], [0.0, 0.0, 0.1], alpha0=0.0)
    twisted = precession_angles_numerical(
        36.0, 29.0, [0.3, 0.0, 0.2], [0.0, 0.35, 0.1], alpha0=0.0)
    a1, cb1, _ = base(f)
    a2, cb2, _ = twisted(f)
    band = (FREQS > 20.0) & (FREQS < 300.0)
    assert np.abs(np.asarray(cb1 - cb2))[band].max() > 1e-3
    assert np.abs(np.asarray(a1 - a2))[band].max() > 1e-2


def test_angle_fn_gauge_matches_closed_form_at_reference():
    """alpha(f_ref) = alpha0 and eps(f_ref) = alpha(f_ref) — the closed
    form's gauge — so the two models are drop-in interchangeable."""
    fn = precession_angles_numerical(
        36.0, 29.0, [0.4, 0.0, 0.2], [0.0, 0.3, -0.1], alpha0=1.2)
    a, cb, e = fn(jnp.asarray([20.0]))
    np.testing.assert_allclose(float(a[0]), 1.2, atol=1e-5)
    np.testing.assert_allclose(float(e[0]), float(a[0]), atol=1e-5)


def test_twist_through_angle_fn_reduces_when_angles_are_trivial():
    """Driving the twist with a frozen-angle angle_fn (beta = 0) must
    reproduce the aligned waveform — the same reduction the chip = 0 path
    takes, but exercised through the angle_fn plumbing."""
    f = jnp.asarray(FREQS)

    def trivial(freqs):
        z = jnp.zeros(jnp.shape(freqs), jnp.float32)
        return z, jnp.ones(jnp.shape(freqs), jnp.float32), z

    args = dict(m1=36.0, m2=29.0, chi1z=0.2, chi2z=-0.1,
                distance_mpc=410.0, inclination=0.9, tc=0.1, phic=0.4,
                f_lower=20.0)
    hp_ref, hc_ref = phenomp_hplus_hcross(f, chip=0.0, **args)
    hp_fn, hc_fn = phenomp_hplus_hcross(
        f, chip=0.7, angle_fn=trivial, **args)   # chip must be ignored
    np.testing.assert_allclose(
        np.asarray(hp_fn), np.asarray(hp_ref), rtol=2e-5, atol=1e-28)
    np.testing.assert_allclose(
        np.asarray(hc_fn), np.asarray(hc_ref), rtol=2e-5, atol=1e-28)


def test_twist_with_numerical_angles_produces_modulation():
    f = jnp.asarray(FREQS)
    fn = precession_angles_numerical(
        36.0, 29.0, [0.6, 0.0, 0.0], [0.0, 0.5, 0.0], alpha0=0.0)
    hp_p, _ = phenomp_hplus_hcross(
        f, m1=36.0, m2=29.0, chi1z=0.0, chi2z=0.0, chip=0.0,
        distance_mpc=410.0, inclination=1.2, angle_fn=fn)
    hp_a, _ = phenomp_hplus_hcross(
        f, m1=36.0, m2=29.0, chi1z=0.0, chi2z=0.0, chip=0.0,
        distance_mpc=410.0, inclination=1.2)
    band = (FREQS > 25.0) & (FREQS < 200.0)
    ratio = np.abs(np.asarray(hp_p))[band] / np.abs(np.asarray(hp_a))[band]
    # precession modulates the band amplitude: substantial spread
    assert ratio.std() / ratio.mean() > 0.02


class TestTwoSpinApproximants:
    """The '-twospin' approximant strings: table plumbing through
    td_polarizations and the challenge generator's synthesis switch."""

    def _params(self, rng, n=3):
        from gwkit.data.waveforms import SourceDistribution

        dist = SourceDistribution(spin_max=0.9, isotropic_spins=True)
        p = dist.sample(rng, n)
        for k in ("spin1x", "spin1y", "spin2x", "spin2y"):
            assert k in p, k
        return p

    def test_td_polarizations_twospin_differs_from_chip_summary(self):
        from gwkit.data.waveforms import td_polarizations

        p = self._params(np.random.default_rng(7))
        hp_ode, hc_ode = td_polarizations(
            p, 8.0, 2048.0, approximant="imrphenomxphm-twospin")
        hp_lo, _ = td_polarizations(p, 8.0, 2048.0, approximant="imrphenomxphm")
        assert bool(jnp.all(jnp.isfinite(hp_ode)))
        assert bool(jnp.all(jnp.isfinite(hc_ode)))
        scale = float(jnp.max(jnp.abs(hp_lo)))
        assert float(jnp.max(jnp.abs(hp_ode - hp_lo))) > 0.01 * scale

    def test_aligned_table_reduces_to_lo_path(self):
        """With zero in-plane spin the ODE angles freeze, so the '-twospin'
        variant must agree with the chi_p = 0 leading-order path."""
        from gwkit.data.waveforms import SourceDistribution, td_polarizations

        p = SourceDistribution(spin_max=0.5).sample(np.random.default_rng(3), 3)
        ha, _ = td_polarizations(p, 8.0, 2048.0, approximant="imrphenomxphm-twospin")
        hb, _ = td_polarizations(p, 8.0, 2048.0, approximant="imrphenomxphm")
        scale = float(jnp.max(jnp.abs(hb)))
        np.testing.assert_allclose(
            np.asarray(ha), np.asarray(hb), atol=2e-4 * scale)

    def test_generator_window_synthesis_accepts_twospin(self):
        """The on-device training-window path (generate._training_windows_
        batch) must synthesize finite, nonzero windows for the '-twospin'
        approximant, i.e. the spin-vector columns survive the jit plumbing."""
        from gwkit.data.generate import _training_windows_batch
        from gwkit.ops.psd import get_psd

        p = self._params(np.random.default_rng(11), n=2)
        p["tc"] = np.zeros(2)
        n = int(4.0 * 2048.0)
        psd = get_psd("aLIGOZeroDetHighPower", n // 2 + 1, 1.0 / 4.0, 15.0)
        psd_n = jnp.asarray((psd / psd[psd > 0].mean()).astype(np.float32))
        out = _training_windows_batch(
            p, slice(0, 2), wave_duration=4.0, sample_rate=2048.0,
            f_lower=20.0, scale=1.0, detectors=("H1", "L1"),
            psd_wave_n=psd_n, mfl_dur=0.5, s0=2048, n_window=2048,
            tc_frac=0.75, approximant="imrphenomxphm-twospin")
        assert out.shape == (2, 2, 2048)
        assert np.isfinite(out).all()
        assert np.abs(out).max() > 0.0
