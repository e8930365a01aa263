"""Scoring-server tests: request handling parity with the direct engine path,
the socket protocol round trip, and error/guard behavior.

The server wraps gwkit.search.engine.get_triggers (reference hot loop
MLGWSC-1/inference.py:454-489) behind a resident process so repeat requests
reuse the compiled scoring program; these tests run it on a tiny model/file.
"""
import json
import os
import threading

import h5py
import numpy as np
import pytest

import jax

from gwkit.models.qadapter import QAdapterConfig
from gwkit.models.whisper import WhisperConfig
from gwkit.search.engine import get_triggers, write_search_output
from gwkit.serve import ScoringServer, request
from gwkit.train.tasks import build_mlgwsc


@pytest.fixture(scope="module")
def tiny_task():
    enc = WhisperConfig(d_model=64, n_heads=2, n_layers=2, d_ff=128, max_positions=256)
    qcfg = QAdapterConfig(spectrogram_shape=(64, 64), target_shape=(80, 512))
    return build_mlgwsc(jax.random.PRNGKey(0), encoder=enc, qcfg=qcfg, usr=True)


@pytest.fixture(scope="module")
def strain_file(tmp_path_factory):
    """A minimal searchable two-detector file (pre-whitened layout)."""
    d = tmp_path_factory.mktemp("serve")
    path = str(d / "strain.hdf")
    fs = 2048
    rng = np.random.default_rng(7)
    with h5py.File(path, "w") as f:
        for det in ("H1", "L1"):
            g = f.create_group(det)
            ds = g.create_dataset("1000000", data=rng.normal(size=fs * 8).astype(np.float32))
            ds.attrs["start_time"] = 1000000.0
            ds.attrs["delta_t"] = 1.0 / fs
    return path


def _expected(task, strain_file, out_path, **opts):
    triggers, all_vals, _ = get_triggers(task, strain_file, **opts)
    write_search_output(out_path, triggers, all_vals)
    return triggers


def test_handle_request_matches_direct_engine(tiny_task, strain_file, tmp_path):
    server = ScoringServer(tiny_task, str(tmp_path / "unused.sock"),
                           trigger_threshold=-1e9, batch_size=32)
    out = str(tmp_path / "events.hdf")
    resp = server.handle_request(
        {"input": strain_file, "output": out, "white": True})
    assert resp["ok"], resp
    assert os.path.isfile(out)
    assert resp["n_windows"] > 0 and resp["n_triggers"] > 0

    ref_out = str(tmp_path / "ref_events.hdf")
    _expected(tiny_task, strain_file, ref_out,
              trigger_threshold=-1e9, batch_size=32, white=True)
    with h5py.File(out) as a, h5py.File(ref_out) as b:
        for key in ("time", "stat", "var"):
            np.testing.assert_allclose(a[key][()], b[key][()])


def test_handle_request_guards(tiny_task, strain_file, tmp_path):
    server = ScoringServer(tiny_task, str(tmp_path / "unused.sock"),
                           trigger_threshold=-1e9, batch_size=32)
    out = str(tmp_path / "events.hdf")
    assert not server.handle_request({"output": out})["ok"]
    assert not server.handle_request({"input": "/nope.hdf", "output": out})["ok"]
    bad = server.handle_request(
        {"input": strain_file, "output": out, "white": True, "wat": 1})
    assert not bad["ok"] and "unknown option" in bad["error"]

    ok = server.handle_request({"input": strain_file, "output": out, "white": True})
    assert ok["ok"]
    again = server.handle_request({"input": strain_file, "output": out, "white": True})
    assert not again["ok"] and "exists" in again["error"]
    forced = server.handle_request(
        {"input": strain_file, "output": out, "white": True, "force": True})
    assert forced["ok"]


def test_warmup_precompiles_request_path(tiny_task, strain_file, tmp_path):
    """warmup() must prime the SAME jitted function real requests use —
    the engine's per-weights score_fn cache — not a throwaway closure
    (which would leave the first request cold, the round-3 review bug)."""
    from gwkit.search import engine

    server = ScoringServer(tiny_task, str(tmp_path / "unused.sock"),
                           trigger_threshold=-1e9, batch_size=32)
    engine._SCORE_FN_CACHE.clear()
    wall = server.warmup(seconds=4.0)
    assert wall > 0
    key = next(k for k in engine._SCORE_FN_CACHE if k[0] == id(tiny_task))
    warm_fn = engine._SCORE_FN_CACHE[key][3]

    out = str(tmp_path / "warm_events.hdf")
    resp = server.handle_request({"input": strain_file, "output": out})
    assert resp["ok"], resp
    assert engine._SCORE_FN_CACHE[key][3] is warm_fn  # reused, not rebuilt


def test_rejects_unknown_default():
    with pytest.raises(ValueError):
        ScoringServer(object(), "/tmp/x.sock", nonsense=1)


def test_socket_round_trip(tiny_task, strain_file, tmp_path):
    sock_path = str(tmp_path / "gw.sock")
    server = ScoringServer(tiny_task, sock_path,
                           trigger_threshold=-1e9, batch_size=32, white=True)
    server.bind()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        pong = request(sock_path, {"cmd": "ping"})
        assert pong["ok"] and pong["pong"]

        out = str(tmp_path / "sock_events.hdf")
        resp = request(sock_path, {"input": strain_file, "output": out})
        assert resp["ok"], resp
        assert os.path.isfile(out)
        assert request(sock_path, {"cmd": "ping"})["n_served"] == 1
    finally:
        bye = request(sock_path, {"cmd": "shutdown"})
    assert bye["ok"] and bye["bye"]
    thread.join(timeout=30)
    assert not thread.is_alive()
    assert not os.path.exists(sock_path)


def test_watch_directory(tiny_task, strain_file, tmp_path):
    """Online mode: new files are scored once settled; failures leave a
    tombstone instead of wedging the watcher; outputs make restarts no-ops."""
    import shutil

    from gwkit.serve import watch_directory

    watch = tmp_path / "incoming"
    watch.mkdir()
    server = ScoringServer(tiny_task, str(tmp_path / "unused.sock"),
                           trigger_threshold=-1e9, batch_size=32, white=True)

    shutil.copy(strain_file, watch / "b_good.hdf")
    (watch / "a_bad.hdf").write_bytes(b"not an hdf5 file")
    n = watch_directory(server, str(watch), poll_seconds=0.05,
                        settle_seconds=0.05, stop_after=1)
    assert n == 1
    assert (watch / "b_good_events.hdf").is_file()
    assert (watch / "a_bad_events.hdf.failed").is_file()
    assert not (watch / "a_bad_events.hdf").exists()

    # restart safety: previous outputs/tombstones are skipped; only the new
    # file is scored
    first_mtime = (watch / "b_good_events.hdf").stat().st_mtime_ns
    shutil.copy(strain_file, watch / "c_new.hdf")
    n = watch_directory(server, str(watch), poll_seconds=0.05,
                        settle_seconds=0.05, stop_after=1)
    assert n == 1
    assert (watch / "c_new_events.hdf").is_file()
    assert (watch / "b_good_events.hdf").stat().st_mtime_ns == first_mtime


def test_cli_client_roundtrip(tiny_task, strain_file, tmp_path, capsys):
    """The CLI's client mode speaks the same protocol (server run in-thread)."""
    sock_path = str(tmp_path / "cli.sock")
    server = ScoringServer(tiny_task, sock_path,
                           trigger_threshold=-1e9, batch_size=32, white=True)
    server.bind()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    from gwkit.cli.serve import main

    out = str(tmp_path / "cli_events.hdf")
    try:
        with pytest.raises(SystemExit) as exc:
            main(["--socket", sock_path, "--ping"])
        assert exc.value.code == 0
        with pytest.raises(SystemExit) as exc:
            main(["--socket", sock_path, "--score", strain_file, out, "--white"])
        assert exc.value.code == 0
        resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert resp["ok"] and os.path.isfile(out)
    finally:
        request(sock_path, {"cmd": "shutdown"})
    thread.join(timeout=30)
