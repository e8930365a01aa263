"""Q-transform tests: geometry, scale-compensation vs a direct per-row numpy
reference, physical localization of a chirp/sinusoid, and jit-compatibility."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwkit.ops.qtransform import make_qplan, plane_frequencies, q_values, qscan


def test_q_values_cover_range():
    qs = q_values((4.0, 128.0), 0.2)
    assert len(qs) == 5
    assert qs[0] > 4.0 and qs[-1] < 128.0
    # log-spaced
    ratios = np.diff(np.log(qs))
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-10)


def test_plane_frequencies_monotone():
    f = plane_frequencies(10.0, 1.0, 2048.0)
    assert np.all(np.diff(f) > 0)
    assert f[0] >= 50.0 * 10.0 / (2 * np.pi) / 2  # near the default low cut
    assert f[-1] <= 1024.0


def test_row_energy_matches_per_row_ifft(rng):
    """The common-length iFFT with ntiles/n_common compensation must agree
    exactly (at stride n_common/ntiles) with the per-row ntiles-length iFFT
    of the GWpy algorithm."""
    plan = make_qplan(1.0, 2048.0, (4.0, 64.0), (64, 64))
    x = rng.normal(size=2048).astype(np.float64)
    fseries = np.fft.rfft(x)

    # reconstruct row geometry for plane 0, row index choice
    q = plan.qs[0]
    freqs = plan.row_freqs[0]
    deltam = 2.0 * np.sqrt(0.2 / 3.0)
    qprime = q / np.sqrt(11.0)

    # our batched energies
    from gwkit.ops.qtransform import qscan as _  # noqa: F401

    B = 1
    total_rows = sum(plan.n_rows)
    gathered = fseries[plan.src_idx] * plan.weight
    flat = np.zeros(total_rows * plan.n_common, np.complex128)
    np.add.at(flat, plan.dst_idx, gathered)
    spec = flat.reshape(total_rows, plan.n_common)
    ours_all = np.abs(np.fft.ifft(spec, axis=-1)) ** 2

    for r, f in enumerate(list(freqs)[:3]):
        windowsize = 2 * int(f / qprime * 1.0) + 1
        tcum = 1.0 * 2 * np.pi * f / q
        ntiles = int(2 ** np.ceil(np.log2(max(tcum / deltam, 1.0))))
        half = (windowsize - 1) // 2
        k = np.arange(windowsize) - half
        wfreqs = k / 1.0
        xfreqs = wfreqs * qprime / f
        norm = ntiles / (1.0 * 2048.0) * np.sqrt(315.0 * qprime / (128.0 * f))
        window = (1 - xfreqs ** 2) ** 2 * norm
        center = int(round(f * 1.0))
        src = center + k
        valid = (src >= 0) & (src < len(fseries))
        padded = np.zeros(ntiles, np.complex128)
        np.add.at(padded, np.mod(k[valid], ntiles), fseries[src[valid]] * window[valid])
        ref = np.abs(np.fft.ifft(padded)) ** 2
        stride = plan.n_common // ntiles
        np.testing.assert_allclose(ours_all[r, ::stride], ref, rtol=1e-8, atol=1e-12)


def test_qscan_localizes_burst(rng):
    # NB: a *stationary* tone normalizes away under the per-row median norm
    # (it raises its own row median) — the physical use case is transients.
    fs, dur = 2048.0, 1.0
    t = np.arange(int(fs * dur)) / fs
    f0, t0 = 200.0, 0.6
    burst = np.sin(2 * np.pi * f0 * t) * np.exp(-(((t - t0) / 0.03) ** 2))
    x = (rng.normal(size=(2, len(t))) * 0.1).astype(np.float32)
    x[0] += burst.astype(np.float32)
    spec = np.asarray(qscan(jnp.asarray(x), spectrogram_shape=(128, 128)))
    assert spec.shape == (2, 128, 128)
    # the burst sample has much larger peak energy than noise-only
    assert spec[0].max() > 5 * spec[1].max()
    # peak should localize near t0 = 0.6 (column ~77 of 128)
    col = spec[0].max(axis=0).argmax()
    assert abs(col / 128.0 - t0) < 0.1


def test_qscan_time_decimation_exact(rng):
    """Spectral-fold decimation is EXACT: unnormalized energies at stride d
    equal the decimated run's energies (up to the 1/d^2 fold rescale)."""
    plan = make_qplan(1.0, 2048.0, (4.0, 64.0), (64, 64))
    x = jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32))
    import jax.numpy as jnp2

    fseries = jnp2.fft.rfft(x, axis=-1)
    gather_idx, gather_weight = plan.dense_gather()
    spec = fseries[:, gather_idx] * jnp2.asarray(gather_weight)
    full = jnp2.fft.ifft(spec, axis=-1)
    e_full = np.asarray(full.real ** 2 + full.imag ** 2)
    d = 4
    folded = spec.reshape(2, -1, d, plan.n_common // d).sum(axis=-2)
    dec = jnp2.fft.ifft(folded, axis=-1)
    e_dec = np.asarray(dec.real ** 2 + dec.imag ** 2) / d ** 2
    np.testing.assert_allclose(e_dec, e_full[..., ::d], rtol=2e-4, atol=1e-8)


def test_qscan_decimated_spectrogram_close(rng):
    """End-to-end decimated q-scan stays close to the full computation (the
    normalizer and interpolation taps shift slightly)."""
    fs = 2048.0
    t = np.arange(2048) / fs
    burst = np.sin(2 * np.pi * 180 * t) * np.exp(-(((t - 0.5) / 0.05) ** 2))
    x = jnp.asarray((burst + 0.1 * rng.normal(size=2048))[None].astype(np.float32))
    full = np.asarray(qscan(x, spectrogram_shape=(64, 64)))
    dec = np.asarray(qscan(x, spectrogram_shape=(64, 64), time_decimation=4))
    assert dec.shape == full.shape
    # peak location agrees
    assert np.unravel_index(dec[0].argmax(), dec[0].shape)[1] == pytest.approx(
        np.unravel_index(full[0].argmax(), full[0].shape)[1], abs=2
    )
    corr = np.corrcoef(dec[0].ravel(), full[0].ravel())[0, 1]
    assert corr > 0.98, f"decimated spectrogram diverged: corr={corr}"


def test_qscan_jits_and_is_deterministic(rng):
    x = jnp.asarray(rng.normal(size=(2, 2048)).astype(np.float32))
    plan = make_qplan(1.0, 2048.0, (4.0, 128.0), (64, 64))
    f = jax.jit(lambda s: qscan(s, plan))
    a = np.asarray(f(x))
    b = np.asarray(f(x))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_qadapter_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from gwkit.models.qadapter import adaptive_avg_pool2d

    x = rng.normal(size=(2, 32, 32)).astype(np.float32)
    ref = torch.nn.functional.adaptive_avg_pool2d(torch.from_numpy(x), (80, 300)).numpy()
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (80, 300)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_qadapter_cnn_matches_torch(rng):
    """Golden test of the Q-adapter CNN+pool+FiLM vs a torch replica of the
    reference architecture (MLGWSC-1/train.py:118-133), weights copied."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from gwkit.models.qadapter import QAdapterConfig, init_qadapter

    cfg = QAdapterConfig(spectrogram_shape=(32, 32), target_shape=(20, 50), channels=(8, 12, 16))
    params = init_qadapter(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a, params)
    # perturb FiLM/affine so they matter
    params["scale"] = params["scale"] * 1.3
    params["bias"] = params["bias"] + 0.1
    params["film_gamma"] = params["film_gamma"].at[1].set(0.7)
    params["film_beta"] = params["film_beta"].at[0].set(-0.2)

    c1, c2, c3 = cfg.channels
    tnet = nn.Sequential(
        nn.Conv2d(1, c1, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
        nn.Conv2d(c1, c2, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
        nn.Conv2d(c2, c3, 3, padding=1), nn.ReLU(),
        nn.Conv2d(c3, 1, 1),
    )
    with torch.no_grad():
        for tc, ours_key in zip([tnet[0], tnet[3], tnet[6], tnet[8]], ["conv1", "conv2", "conv3", "conv4"]):
            w = np.asarray(params[ours_key]["w"])  # (kh, kw, cin, cout)
            tc.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
            tc.bias.copy_(torch.from_numpy(np.asarray(params[ours_key]["b"])))

    qspec = rng.normal(size=(3, 2, 32, 32)).astype(np.float32)  # (B, D, F, T) pretend q output
    with torch.no_grad():
        outs = []
        for i in range(2):
            y = tnet(torch.from_numpy(qspec[:, i : i + 1]))
            y = torch.nn.functional.adaptive_avg_pool2d(y, cfg.target_shape).squeeze(1)
            y = float(params["scale"][0]) * y + float(params["bias"][0])
            y = y * float(params["film_gamma"][i]) + float(params["film_beta"][i])
            outs.append(y)
        ref = torch.stack(outs, dim=1).numpy()

    # drive our CNN tail directly on the same fake q-spectrogram
    from gwkit.models.qadapter import _conv2d, _max_pool2, adaptive_avg_pool2d

    x = jnp.asarray(qspec.reshape(6, 32, 32))[..., None]
    x = jax.nn.relu(_conv2d(x, params["conv1"], ((1, 1), (1, 1))))
    x = _max_pool2(x)
    x = jax.nn.relu(_conv2d(x, params["conv2"], ((1, 1), (1, 1))))
    x = _max_pool2(x)
    x = jax.nn.relu(_conv2d(x, params["conv3"], ((1, 1), (1, 1))))
    x = _conv2d(x, params["conv4"], ((0, 0), (0, 0)))[..., 0]
    x = adaptive_avg_pool2d(x, cfg.target_shape)
    x = params["scale"] * x + params["bias"]
    x = x.reshape(3, 2, *cfg.target_shape)
    x = x * params["film_gamma"][None, :, None, None] + params["film_beta"][None, :, None, None]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-4, atol=1e-5)


def test_qscan_native_grids_match_dense_reference(rng):
    """The production path (per-row-native bucketed iFFTs + 2-tap gather
    interpolation + deferred normalization) must match a plain numpy
    reference built from the same bucket tables with np.fft.ifft and DENSE
    bilinear-interpolation matrices — covering both the MXU iDFT branch
    (L <= 1024) and the XLA-FFT branch (the q_range (4,128) @ 1 s/2048 Hz
    plan has rows up to L = 2048)."""
    from gwkit.ops.qtransform import _bilinear_matrix

    plan = make_qplan(1.0, 2048.0, (4.0, 128.0), (64, 64))
    lengths = sorted(b.length for b in plan.buckets)
    assert lengths[0] <= 1024 < lengths[-1]  # both branches exercised
    x = rng.normal(size=(2, 2048)).astype(np.float32)
    got = np.asarray(qscan(jnp.asarray(x), plan))

    fs = np.fft.rfft(x.astype(np.float64))
    R = sum(plan.n_rows)
    tinterp = np.zeros((2, R, 64))
    rowmax = np.zeros((2, R))
    for b in plan.buckets:
        spec = fs[:, b.gather_idx] * b.gather_weight
        e = np.abs(np.fft.ifft(spec, axis=-1)) ** 2
        den = np.maximum(np.median(e, axis=-1, keepdims=True), 1e-30)
        ti = _bilinear_matrix(b.length, 64).T
        tinterp[:, b.rows] = (e @ ti) / den
        rowmax[:, b.rows] = e.max(-1) / den[..., 0]
    specs, peaks = [], []
    offset = 0
    for p_i, nr in enumerate(plan.n_rows):
        rows = tinterp[:, offset:offset + nr]
        specs.append(np.einsum("fr,brt->bft", plan.freq_interp[p_i], rows))
        peaks.append(rowmax[:, offset:offset + nr].max(-1))
        offset += nr
    stacked = np.stack(specs, 1)
    best = np.argmax(np.stack(peaks, 1), 1)
    want = stacked[np.arange(2), best]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
