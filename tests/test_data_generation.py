"""Data-generation tests: colored-noise PSD recovery, waveform physics,
antenna-pattern properties, segments/time slides, glitch synthesis."""
import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.data.detector import antenna_pattern, time_delay_from_earth_center
from gwkit.data.noise import NoiseGenerator, WhiteNoiseGenerator, colored_noise
from gwkit.data.segments import OverlapSegment, DetectorData, restrict_segments
from gwkit.data.waveforms import SourceDistribution, chirp_mass, f_isco, td_polarizations
from gwkit.ops.psd import welch_psd


def test_colored_noise_matches_target_psd(rng):
    fs, n = 2048.0, 2048 * 32
    f = np.arange(n // 2 + 1) * (fs / n)
    target = 1.0 + 10.0 * np.exp(-(((f - 300) / 50.0) ** 2))  # bump spectrum
    target[f < 10] = 0.0
    x = colored_noise(jax.random.PRNGKey(0), n, 1.0 / fs, jnp.asarray(np.float32(target)))
    est = np.asarray(welch_psd(x[None], 1.0 / fs, segment_duration=1.0))[0]
    f_est = np.arange(len(est)) * 1.0
    band = (f_est > 50) & (f_est < 900)
    target_coarse = np.interp(f_est, f, target)
    ratio = est[band] / target_coarse[band]
    assert 0.8 < np.median(ratio) < 1.2, f"PSD ratio {np.median(ratio)}"


def test_noise_generator_seeded_deterministic():
    gen1 = NoiseGenerator(sample_rate=512.0, seed=7)
    gen2 = NoiseGenerator(sample_rate=512.0, seed=7)
    a = gen1.get(4, 2.0)
    b = gen2.get(4, 2.0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 1024)
    # physical scale restored
    assert 1e-24 < np.abs(a).std() < 1e-19


def test_white_noise_generator():
    w = WhiteNoiseGenerator(sample_rate=512.0, seed=0).get(8, 1.0)
    assert w.shape == (8, 512)
    assert abs(w.std() - 1.0) < 0.05


def test_taylorf2_chirp_properties():
    params = {
        "mass1": np.array([30.0]), "mass2": np.array([30.0]),
        "distance": np.array([400.0]), "inclination": np.array([0.0]),
        "tc": np.array([3.0]), "coa_phase": np.array([0.0]),
    }
    hp, hc = td_polarizations(params, duration=4.0, sample_rate=2048.0, f_lower=20.0)
    hp = np.asarray(hp)[0]
    assert np.isfinite(hp).all()
    # amplitude scale: 30+30 Msun at 400 Mpc peaks around 1e-21..1e-22
    assert 1e-23 < np.abs(hp).max() < 1e-19
    # energy should be concentrated before tc (inspiral chirp)
    n_tc = int(3.0 * 2048)
    assert (hp[:n_tc] ** 2).sum() > 10 * (hp[n_tc + 200:] ** 2).sum()
    # face-on: |hx| == |hp| envelope; check cross is nonzero
    assert np.abs(np.asarray(hc)[0]).max() > 0


def test_f_isco_values():
    # 30+30 Msun ISCO ~73 Hz; 1.4+1.4 ~1570 Hz
    assert abs(f_isco(30.0, 30.0) - 73.0) < 5.0
    assert abs(f_isco(1.4, 1.4) - 1570.0) < 100.0


def test_source_distribution_ranges(rng):
    params = SourceDistribution().sample(rng, 500)
    assert params["mass1"].min() >= 10.0 and params["mass1"].max() <= 50.0
    assert (params["mass1"] >= params["mass2"]).all()
    assert params["chirp_distance"].min() >= 130.0 and params["chirp_distance"].max() <= 350.0
    # distance grows with chirp mass
    mc = chirp_mass(params["mass1"], params["mass2"])
    assert np.corrcoef(mc, params["distance"] / params["chirp_distance"])[0, 1] > 0.99
    assert abs(np.mean(np.sin(params["dec"]))) < 0.1  # isotropic dec


def test_antenna_pattern_properties(rng):
    ra = rng.uniform(0, 2 * np.pi, 500)
    dec = np.arcsin(rng.uniform(-1, 1, 500))
    psi = rng.uniform(0, 2 * np.pi, 500)
    gps = np.full(500, 1238166018.0)
    fp, fc = antenna_pattern("H1", ra, dec, psi, gps)
    assert np.all(fp ** 2 + fc ** 2 <= 1.0 + 1e-9)
    # sky-averaged <F+^2> = 1/5 for an L-shaped interferometer
    assert abs(np.mean(fp ** 2) - 0.2) < 0.04
    # H1/L1 delays bounded by light travel time (~10 ms)
    dt_h = time_delay_from_earth_center("H1", ra, dec, gps)
    dt_l = time_delay_from_earth_center("L1", ra, dec, gps)
    assert np.abs(dt_h - dt_l).max() < 0.011
    assert np.abs(dt_h).max() < 0.022


def test_overlap_segment_time_slides(rng):
    fs = 64.0
    a = DetectorData("H1", rng.normal(size=int(fs * 100)).astype(np.float32), 0.0, fs)
    b = DetectorData("L1", rng.normal(size=int(fs * 120)).astype(np.float32), -10.0, fs)
    seg = OverlapSegment(a, b)
    start, data = seg.get(shift=False)
    assert start == 0.0
    assert data.shape == (2, int(fs * 100))
    start2, shifted = seg.get(shift=True, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(shifted[0], data[0])  # detector 0 unshifted
    assert not np.array_equal(shifted[1], data[1])
    np.testing.assert_allclose(np.sort(shifted[1]), np.sort(data[1]), rtol=1e-6)  # circular roll


def test_restrict_segments():
    spans = [(0.0, 100.0), (200.0, 250.0), (300.0, 500.0)]
    out = restrict_segments(spans, 180.0)
    assert out == [(0.0, 100.0), (200.0, 250.0), (300.0, 330.0)]
    with pytest.raises(ValueError):
        restrict_segments(spans, 1e6)


def test_glitch_synthesis(rng):
    from gwkit.data.glitch import GLITCH_CLASSES, synthetic_glitch_dataset

    x, y = synthetic_glitch_dataset(5, seed=0)
    assert x.shape == (55, 2048)
    assert set(np.unique(y)) == set(range(11))
    # glitch classes should have larger peak amplitude than No Glitch samples
    # (blips are ms-scale transients: mean power barely moves, peaks do)
    noglitch = x[y == GLITCH_CLASSES.index("No Glitch")]
    blip = x[y == GLITCH_CLASSES.index("Blip")]
    assert np.abs(blip).max(axis=1).mean() > 1.3 * np.abs(noglitch).max(axis=1).mean()


def test_generate_training_set_small(tmp_path):
    from gwkit.data.generate import generate_training_set
    from gwkit.data.datasets import InjectionDataset

    path = str(tmp_path / "train.hdf")
    generate_training_set(path, n_train=8, n_valid=4, seed=0, wave_duration=8.0)
    with h5py.File(path, "r") as f:
        ds = InjectionDataset.load(f, "training")
        assert np.asarray(ds.noises).shape == (8, 2, 2048)
        assert np.asarray(ds.waveforms).shape == (4, 2, 2048)
        waves = np.asarray(ds.waveforms)
        noises = np.asarray(ds.noises)
    assert np.isfinite(waves).all() and np.isfinite(noises).all()
    # whitened noise has pycbc normalization std ~= sqrt(fs)
    assert 0.5 * np.sqrt(2048) < noises.std() < 1.5 * np.sqrt(2048)
    # unit-network-SNR waveforms: tiny amplitude relative to whitened noise
    assert 0 < np.abs(waves).max() < noises.std()
