"""Streaming (window-overlap-reuse) Q-scan front end — PERF lever 4.

The streaming formulation (gwkit.ops.qtransform.qscan_stream) transforms a
chunk of whitened strain once and serves each 1 s search window by cropping
its span out of every Q row's energy series, amortizing the band iFFTs
across the 0.1 s-stride overlap. It is NOT exact parity with the per-window
transform (the chunk transform sees data past window boundaries where the
per-window transform wraps periodically — reference semantics:
ml4gw.transforms.QScan per slice, MLGWSC-1/inference.py:316-321), so the
mode is opt-in; these tests pin (1) the plan geometry, (2) closeness to the
exact per-window transform on transients, (3) the engine plumbing: identical
window bookkeeping and bounded score deltas vs the exact path.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gwkit.ops.qtransform import (  # noqa: E402
    make_qplan,
    make_stream_plan,
    qscan,
    qscan_stream,
)

SR = 512.0
QR = (4.0, 64.0)
SHAPE = (64, 64)


def test_stream_plan_geometry():
    """Every window-plan row appears once, at chunk_seconds x its native
    per-window length, with band support scaled to the chunk's rfft grid."""
    base = make_qplan(1.0, SR, QR, SHAPE)
    splan = make_stream_plan(1.0, SR, QR, SHAPE, 0.2, 8)
    assert splan.chunk_samples == int(8 * SR)
    assert len(splan.buckets) == len(base.buckets)
    seen = []
    for sb, b in zip(splan.buckets, base.buckets):
        assert sb.window_length == b.length
        assert sb.length == b.length * 8
        assert sb.gather_idx.shape == (len(b.rows), sb.length)
        np.testing.assert_array_equal(sb.rows, b.rows)
        seen.extend(sb.rows.tolist())
        # a row carries band energy at chunk scale iff it does at window
        # scale (degenerate rows above the geometry's valid band stay zero)
        np.testing.assert_array_equal(
            (sb.gather_weight != 0).any(axis=1),
            (b.gather_weight != 0).any(axis=1),
        )
        assert sb.gather_idx.max() <= int(8 * SR) // 2
    assert sorted(seen) == list(range(sum(base.n_rows)))


def test_stream_energies_match_dense_gather_reference():
    """The slice-based MXU energy path must reproduce the dense formulation
    (signed-offset gather tables + complex iFFT) to float tolerance: the
    natural-order slice differs from the gathered layout by a circular shift
    of L/2, whose iDFT phase factor (-1)^m cancels under |.|^2."""
    from gwkit.ops.qtransform import stream_energies

    rng = np.random.default_rng(5)
    n = int(8 * SR)
    chunk = rng.normal(size=(2, n)).astype(np.float32)
    splan = make_stream_plan(1.0, SR, QR, SHAPE, 0.2, 8)
    got = stream_energies(jnp.asarray(chunk), splan)
    fseries = np.fft.rfft(chunk, axis=-1)
    for sb, e in zip(splan.buckets, got):
        spec = fseries[:, sb.gather_idx] * sb.gather_weight
        ref = np.abs(np.fft.ifft(spec, axis=-1)) ** 2
        scale = max(ref.max(), 1e-30)
        np.testing.assert_allclose(np.asarray(e) / scale, ref / scale,
                                   atol=5e-5)


def test_stream_plan_rejects_bad_chunk():
    with pytest.raises(ValueError):
        make_stream_plan(1.0, SR, QR, SHAPE, 0.2, 1)  # must exceed duration


@pytest.mark.parametrize("t0", [3.0, 3.1])  # integer and fractional starts
def test_qscan_stream_close_to_per_window_on_transient(t0):
    """A chirp-bearing window's streaming spectrogram must track the exact
    per-window Q-scan closely away from the boundary bins (where the two
    formulations legitimately differ: chunk context vs periodic wrap)."""
    rng = np.random.default_rng(0)
    n = int(8 * SR)
    chunk = rng.normal(size=(2, n)).astype(np.float32)
    t = np.arange(n) / SR
    f0 = 20 + 60 * (t - (t0 + 0.2)).clip(0)
    chirp = (np.sin(2 * np.pi * np.cumsum(f0) / SR)
             * np.exp(-0.5 * ((t - (t0 + 0.5)) / 0.1) ** 2) * 10)
    chunk[0] += chirp.astype(np.float32)

    plan = make_qplan(1.0, SR, QR, SHAPE)
    splan = make_stream_plan(1.0, SR, QR, SHAPE, 0.2, 8)
    got = np.asarray(qscan_stream(
        jnp.asarray(chunk), jnp.asarray([t0], jnp.float32), splan))[0]
    i0 = int(round(t0 * SR))
    ref = np.asarray(qscan(jnp.asarray(chunk[:, i0:i0 + int(SR)]), plan))
    assert got.shape == ref.shape
    g, r = got[:, :, 2:-2], ref[:, :, 2:-2]  # interior time bins
    corr = np.corrcoef(g.ravel(), r.ravel())[0, 1]
    assert corr > 0.99, f"streaming spectrogram decorrelated: {corr}"
    # the chirp's spectrogram peak lands in the same cell neighborhood
    gi = np.unravel_index(np.argmax(got[0]), got[0].shape)
    ri = np.unravel_index(np.argmax(ref[0]), ref[0].shape)
    assert abs(gi[0] - ri[0]) <= 2 and abs(gi[1] - ri[1]) <= 2


def test_qscan_stream_norm_none_amplitude_calibrated():
    """With norm='none' (no per-row normalizer to cancel scales), a transient
    fully inside the window must come out at per-window amplitude."""
    rng = np.random.default_rng(2)
    n = int(8 * SR)
    chunk = 0.01 * rng.normal(size=(1, n)).astype(np.float32)
    t = np.arange(n) / SR
    burst = np.sin(2 * np.pi * 40 * t) * np.exp(-0.5 * ((t - 3.5) / 0.05) ** 2)
    chunk[0] += burst.astype(np.float32)
    plan = make_qplan(1.0, SR, QR, SHAPE)
    splan = make_stream_plan(1.0, SR, QR, SHAPE, 0.2, 8)
    got = np.asarray(qscan_stream(
        jnp.asarray(chunk), jnp.asarray([3.0], jnp.float32), splan, norm="none"))[0, 0]
    ref = np.asarray(qscan(
        jnp.asarray(chunk[:, int(3 * SR):int(4 * SR)]), plan, norm="none"))[0]
    assert abs(got.max() / ref.max() - 1.0) < 0.2, (got.max(), ref.max())


def test_engine_streaming_matches_exact_bookkeeping():
    """score_segments with the streaming front end must emit exactly the
    same windows/times as the exact path, with bounded score deltas."""
    from gwkit.search.engine import score_segments
    from gwkit.search.slicer import Segment, SlicerConfig

    sr = 256
    rng = np.random.default_rng(1)
    strain = rng.normal(size=(2, 32 * sr)).astype(np.float32)
    seg = Segment(key="s", strain=strain, start_time=10.0, delta_t=1.0 / sr)
    cfg = SlicerConfig(step_size=0.25, slice_length=sr, batch_size=8,
                       segment_duration=2.0, max_filter_duration=0.5,
                       low_frequency_cutoff=10.0, max_block=4096)
    # geometry args only — the slicer derives the chunk duration from its
    # whitening block (here 3968 whitened samples -> 16 s padded chunk)
    plan_args = (1.0, float(sr), (4.0, 64.0), (64, 64), 0.2)
    plan = make_qplan(1.0, float(sr), (4.0, 64.0), (64, 64))

    @jax.jit
    def score_spec_fn(qspec):
        return jnp.sum(qspec.astype(jnp.float32), axis=(1, 2, 3))

    @jax.jit
    def score_fn(w):
        B, D, L = w.shape
        q = qscan(w.reshape(B * D, L), plan)
        return jnp.sum(q.reshape(B, D, *q.shape[1:]).astype(jnp.float32),
                       axis=(1, 2, 3))

    exact = score_segments(score_fn, [seg], cfg, trigger_threshold=-1e18)
    streamed = score_segments(score_fn, [seg], cfg, trigger_threshold=-1e18,
                              stream_score_fn=score_spec_fn,
                              stream_plan_args=plan_args)
    assert streamed.n_windows == exact.n_windows
    te = sorted(t for v in exact.triggers.values() for t, s in v)
    ts = sorted(t for v in streamed.triggers.values() for t, s in v)
    assert te == ts  # identical window times (threshold below every score)
    rel = (np.abs(exact.all_vals - streamed.all_vals).mean()
           / np.abs(exact.all_vals).mean())
    assert rel < 0.15, f"streaming scores diverged: mean-rel {rel}"


def test_get_triggers_requires_qspec_surface():
    """qscan_stream=True on a task without a Q-scan front end is an error."""
    from gwkit.search.engine import get_triggers

    class NoQspec:
        trainable = {}
        frozen = {}
        forward = staticmethod(lambda tr, fr, w: w.sum(axis=(1, 2))[:, None])
        forward_from_qspec = None
        qcfg = None

    with pytest.raises(ValueError, match="qscan_stream"):
        get_triggers(NoQspec(), "/nonexistent.hdf", qscan_stream=True)


def test_mlgwsc_forward_from_qspec_matches_forward():
    """The task's qspec forward must equal its strain forward when fed the
    strain's own Q spectrograms (shared CNN/pool/FiLM/encoder math)."""
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.train.tasks import build_mlgwsc

    qcfg = QAdapterConfig(sample_rate=256, q_range=(4.0, 64.0),
                          spectrogram_shape=(32, 32), target_shape=(80, 64),
                          channels=(4, 8, 16))
    enc = config_for("tiny", n_layers=1, d_model=64, n_heads=2,
                     max_positions=32)
    task = build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, qcfg=qcfg)
    rng = np.random.default_rng(3)
    strain = jnp.asarray(rng.normal(size=(2, 2, 256)).astype(np.float32))
    want = task.forward(task.trainable, task.frozen, strain)

    plan = make_qplan(1.0, 256.0, (4.0, 64.0), (32, 32))
    flat = strain.reshape(4, 256)
    qspec = qscan(flat, plan).reshape(2, 2, 32, 32)
    got = task.forward_from_qspec(task.trainable, task.frozen, qspec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
