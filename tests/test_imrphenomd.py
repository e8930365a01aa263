"""Physics-invariant tests for the JAX IMRPhenomD implementation.

lalsuite is not installed here (zero-egress image), so instead of
waveform-level golden files these tests pin the model to *published
physical anchor values* and internal consistency laws that any correct
IMRPhenomD implementation must satisfy:

* remnant mass/spin fits at known calibration points (Husa et al. 2016),
* ringdown frequency/damping of the (2,2,0) QNM vs. the tabulated values
  the reference interpolates (Berti et al. 2006),
* exact reduction of the inspiral phase to TaylorF2 when the calibrated
  pseudo-PN terms are removed,
* C^1 continuity across both region boundaries (value + derivative),
* stationarity of the phase at the amplitude peak (peak-time alignment),
* time-domain morphology: chirp -> peak at tc -> exponentially decaying
  ringdown, and more SNR than the inspiral-only approximant.
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@contextlib.contextmanager
def enable_x64():
    """Scoped f64 (the jax.experimental context manager was removed)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)

from gwkit.data import imrphenomd as phd
from gwkit.data.waveforms import (
    MTSUN_SI,
    SourceDistribution,
    taylorf2_phase,
    td_polarizations,
)


class TestFinalState:
    def test_equal_mass_nonspinning_remnant(self):
        af = float(phd.final_spin(0.25, 0.0, 0.0))
        erad = float(phd.radiated_energy(0.25, 0.0, 0.0))
        # Husa et al. 2016: a_f = 0.6865, E_rad = 4.83% for equal-mass
        # non-spinning binaries (the Schwarzschild-limit NR result)
        assert abs(af - 0.6865) < 3e-3
        assert abs(erad - 0.0484) < 3e-3

    def test_extremal_aligned_spinup(self):
        # equal-mass chi1=chi2=1 -> a_f ~ 0.951 (hangup limit of the fit)
        af = float(phd.final_spin(0.25, 1.0, 1.0))
        assert abs(af - 0.951) < 0.01

    def test_spin_ordering(self):
        a_up = float(phd.final_spin(0.25, 0.9, 0.9))
        a_zero = float(phd.final_spin(0.25, 0.0, 0.0))
        a_down = float(phd.final_spin(0.25, -0.9, -0.9))
        assert a_up > a_zero > a_down > 0.0

    def test_radiated_energy_increases_with_aligned_spin(self):
        e_up = float(phd.radiated_energy(0.25, 0.9, 0.9))
        e_dn = float(phd.radiated_energy(0.25, -0.9, -0.9))
        assert e_up > float(phd.radiated_energy(0.25, 0.0, 0.0)) > e_dn


class TestRingdown:
    def test_equal_mass_nonspinning_qnm(self):
        af = phd.final_spin(0.25, 0.0, 0.0)
        erad = phd.radiated_energy(0.25, 0.0, 0.0)
        f_rd, f_damp = phd.qnm_ringdown(af, erad)
        # lalsuite's interpolated QNM table gives Mf_RD ~= 0.0881,
        # Mf_damp ~= 0.0139 for the equal-mass non-spinning remnant
        assert abs(float(f_rd) - 0.0881) < 2e-3
        assert abs(float(f_damp) - 0.0139) < 1.5e-3

    def test_gw150914_scale(self):
        # 65 Msun total, equal mass, non-spinning: ringdown ~ 250-300 Hz
        af = phd.final_spin(0.25, 0.0, 0.0)
        erad = phd.radiated_energy(0.25, 0.0, 0.0)
        f_rd, _ = phd.qnm_ringdown(af, erad)
        f_hz = float(f_rd) / (65.0 * MTSUN_SI)
        assert 240.0 < f_hz < 310.0

    def test_spin_ordering(self):
        def frd(chi):
            af = phd.final_spin(0.25, chi, chi)
            return float(phd.qnm_ringdown(af, phd.radiated_energy(0.25, chi, chi))[0])

        assert frd(0.9) > frd(0.0) > frd(-0.9)


def _coeffs64(eta, chi1, chi2):
    return phd.phenomd_coeffs(jnp.float64(eta), jnp.float64(chi1), jnp.float64(chi2))


class TestPhase:
    def test_inspiral_reduces_to_taylorf2(self):
        """With the calibrated sigma terms zeroed, the inspiral region IS
        TaylorF2 — any residual beyond a constant (phase-reference
        convention) would mean a transcription error in the PN series."""
        with enable_x64():
            c = _coeffs64(0.2, 0.0, 0.0)
            c = c._replace(sigma1=jnp.float64(0), sigma2=jnp.float64(0),
                           sigma3=jnp.float64(0), sigma4=jnp.float64(0))
            mf = jnp.linspace(0.002, 0.017, 200, dtype=jnp.float64)
            mine = phd._phase_ins(mf, c)
            # same phase through the legacy module: masses with eta = 0.2
            # (mass ratio q solves q/(1+q)^2 = 0.2 -> q = (3-sqrt(5))/2)
            q = 0.38196601125010515
            mtot = 60.0
            m1, m2 = mtot / (1.0 + q), mtot * q / (1.0 + q)
            f = mf / (mtot * MTSUN_SI)
            legacy = taylorf2_phase(f, m1, m2, tc=0.0, phic=0.0)
            diff = np.asarray(mine - (legacy + jnp.pi / 4.0))
            # difference must be a pure constant (log(v_lso) convention)
            assert np.ptp(diff) < 1e-6, np.ptp(diff)

    @pytest.mark.parametrize("eta,chi1,chi2", [
        (0.25, 0.0, 0.0), (0.25, 0.8, 0.8), (0.16, -0.6, 0.3), (0.1, 0.5, -0.5),
    ])
    def test_c1_continuity(self, eta, chi1, chi2):
        with enable_x64():
            c = _coeffs64(eta, chi1, chi2)
            for fb in (phd.PHI_F_JOIN_INS, 0.5 * float(c.f_rd)):
                eps = 1e-6
                lo, hi = fb - eps, fb + eps
                p = jax.vmap(lambda f: phd.phenomd_phase(f, c))(
                    jnp.array([lo - eps, lo, hi, hi + eps], dtype=jnp.float64))
                # value continuity
                assert abs(float(p[2] - p[1])) < 1e-4 * max(1.0, abs(float(p[1])))
                # derivative continuity (one-sided finite differences)
                d_lo = float(p[1] - p[0]) / eps
                d_hi = float(p[3] - p[2]) / eps
                assert abs(d_hi - d_lo) < 1e-3 * max(1.0, abs(d_lo))

    def test_phase_stationary_at_amplitude_peak(self):
        with enable_x64():
            c = _coeffs64(0.25, 0.0, 0.0)
            f_peak = phd._amp_peak_freq(c)
            dphi = jax.grad(lambda f: phd.phenomd_phase(f, c))(f_peak)
            # group delay zero at the peak -> merger sits at t = tc
            scale = abs(float(jax.grad(lambda f: phd.phenomd_phase(f, c))(0.5 * f_peak)))
            assert abs(float(dphi)) < 1e-6 * max(scale, 1.0)


class TestAmplitude:
    @pytest.mark.parametrize("eta,chi1,chi2", [
        (0.25, 0.0, 0.0), (0.25, 0.85, 0.85), (0.25, -0.85, -0.85),
        (0.16, 0.5, -0.5), (0.1, 0.0, 0.0), (0.12, -0.8, 0.8),
    ])
    def test_positive_and_continuous(self, eta, chi1, chi2):
        with enable_x64():
            c = _coeffs64(eta, chi1, chi2)
            mf = jnp.linspace(0.003, 0.15, 3000, dtype=jnp.float64)
            a = np.asarray(phd.phenomd_amplitude(mf, c))
            assert np.all(np.isfinite(a))
            # a sign flip or >25% jump between adjacent samples would mean
            # a mis-transcribed fit coefficient
            assert np.all(a > 0)
            rel = np.abs(np.diff(a)) / np.maximum(a[:-1], 1e-30)
            assert rel.max() < 0.25

    def test_peak_freq_is_mr_stationary_point(self):
        """`fmaxCalc` must be the stationary point of the merger-ringdown
        amplitude ansatz (that is its definition), and must sit between
        half the ringdown frequency and f_RD."""
        with enable_x64():
            for chi in (0.0, 0.7, -0.7):
                c = _coeffs64(0.25, chi, chi)
                f_peak = phd._amp_peak_freq(c)
                d = float(jax.grad(phd._amp_mrd)(f_peak, c))
                scale = abs(float(jax.grad(phd._amp_mrd)(0.9 * f_peak, c)))
                assert abs(d) < 1e-8 * max(scale, 1e-3)
                assert 0.5 * float(c.f_rd) < float(f_peak) < 1.05 * float(c.f_rd)

    def test_inspiral_correction_near_unity_at_low_freq(self):
        with enable_x64():
            c = _coeffs64(0.25, 0.0, 0.0)
            a = float(phd._amp_ins(jnp.float64(1e-4), c))
            assert abs(a - 1.0) < 0.02


class TestTimeDomain:
    DUR, SR = 16.0, 2048.0

    def _synth(self, approximant, m=30.0, chi=0.0, tc=12.0):
        params = {
            "mass1": np.array([m]), "mass2": np.array([m]),
            "spin1z": np.array([chi]), "spin2z": np.array([chi]),
            "distance": np.array([400.0]), "inclination": np.array([0.0]),
            "tc": np.array([tc]), "coa_phase": np.array([0.0]),
        }
        hp, _ = td_polarizations(params, self.DUR, self.SR, f_lower=20.0,
                                 approximant=approximant)
        return np.asarray(hp[0])

    def test_merger_peak_at_tc_and_ringdown_decay(self):
        h = self._synth("imrphenomd")
        t = np.arange(len(h)) / self.SR
        i_peak = int(np.argmax(np.abs(h)))
        assert abs(t[i_peak] - 12.0) < 0.1
        total = float(np.sum(h ** 2))
        after = float(np.sum(h[int((12.0 + 0.2) * self.SR):] ** 2))
        assert after < 0.02 * total
        # and a real inspiral before the peak: the second preceding
        # 1/2-second window carries non-negligible (but smaller) power
        pre = float(np.sum(h[int(10.5 * self.SR): int(11.0 * self.SR)] ** 2))
        assert 0.0 < pre < 0.5 * total

    def test_merger_power_above_isco(self):
        """TaylorF2 is truncated at ISCO (~63 Hz for 70 Msun); the IMR
        waveform must carry substantial power above it (the merger), and a
        higher time-domain peak than the truncated inspiral."""
        h_imr = self._synth("imrphenomd", m=35.0)
        h_tf2 = self._synth("taylorf2", m=35.0)
        freqs = np.fft.rfftfreq(len(h_imr), 1.0 / self.SR)
        hi_band = freqs > 70.0
        p_imr = np.abs(np.fft.rfft(h_imr)) ** 2
        p_tf2 = np.abs(np.fft.rfft(h_tf2)) ** 2
        assert p_imr[hi_band].sum() > 0.1 * p_imr.sum()
        assert p_imr[hi_band].sum() > 20.0 * p_tf2[hi_band].sum()
        assert np.max(np.abs(h_imr)) > 1.2 * np.max(np.abs(h_tf2))

    def test_aligned_spin_lengthens_waveform(self):
        # orbital hangup: chi > 0 -> more inspiral cycles and later ISCO
        h_up = self._synth("imrphenomd", chi=0.8)
        h_dn = self._synth("imrphenomd", chi=-0.8)
        thresh_up = 0.05 * np.max(np.abs(h_up))
        thresh_dn = 0.05 * np.max(np.abs(h_dn))
        t_up = np.flatnonzero(np.abs(h_up) > thresh_up)
        t_dn = np.flatnonzero(np.abs(h_dn) > thresh_dn)
        assert (t_up[-1] - t_up[0]) > (t_dn[-1] - t_dn[0])

    def test_batched_mixed_spins_finite(self):
        rng = np.random.default_rng(0)
        n = 8
        params = {
            "mass1": rng.uniform(10, 50, n).astype(np.float32),
            "mass2": rng.uniform(10, 50, n).astype(np.float32),
            "spin1z": rng.uniform(-0.9, 0.9, n).astype(np.float32),
            "spin2z": rng.uniform(-0.9, 0.9, n).astype(np.float32),
            "distance": rng.uniform(100, 1000, n).astype(np.float32),
            "inclination": rng.uniform(0, np.pi, n).astype(np.float32),
            "tc": np.full(n, 12.0, np.float32),
            "coa_phase": rng.uniform(0, 2 * np.pi, n).astype(np.float32),
        }
        hp, hc = td_polarizations(params, self.DUR, self.SR)
        assert np.all(np.isfinite(np.asarray(hp)))
        assert np.all(np.isfinite(np.asarray(hc)))
        assert np.all(np.max(np.abs(np.asarray(hp)), axis=-1) > 0)


class TestSourceDistributionSpins:
    def test_default_nonspinning(self):
        p = SourceDistribution().sample(np.random.default_rng(0), 16)
        assert np.all(p["spin1z"] == 0) and np.all(p["spin2z"] == 0)

    def test_aligned_bounds(self):
        d = SourceDistribution(spin_max=0.99)
        p = d.sample(np.random.default_rng(0), 500)
        for k in ("spin1z", "spin2z"):
            assert np.all(np.abs(p[k]) <= 0.99)
        # double-sided: both signs occur
        assert (p["spin1z"] > 0.1).any() and (p["spin1z"] < -0.1).any()

    def test_isotropic_projection_bounds(self):
        d = SourceDistribution(spin_max=0.9, isotropic_spins=True)
        p = d.sample(np.random.default_rng(1), 500)
        assert np.all(np.abs(p["spin1z"]) <= 0.9)
        # z-projections concentrate toward zero relative to aligned sampling
        assert np.abs(p["spin1z"]).mean() < 0.45 * 0.9
