"""Real-data ingestion layer (gwkit.data.fetch) with synthetic fetch
functions — everything after the network call is exercised without gwpy."""
import numpy as np
import pytest

import h5py

from gwkit.data.fetch import (
    build_gravityspy_corpus,
    fetch_event_file,
    fetch_glitch_window,
    read_gravityspy_csv,
)
from gwkit.data.glitch import CLASS_TO_INDEX


def _fake_fetch_factory(rate=4096.0, glitch_freq=120.0):
    """Deterministic fake open-data server: noise + a sine-gaussian at the
    requested center GPS time."""

    def fetch(ifo, gps_start, gps_end):
        n = int((gps_end - gps_start) * rate)
        t = gps_start + np.arange(n) / rate
        rng = np.random.default_rng(abs(hash((ifo, int(gps_start)))) % 2**32)
        center = (gps_start + gps_end) / 2
        sig = 5e-21 * np.exp(-(((t - center) / 0.05) ** 2)) * np.sin(
            2 * np.pi * glitch_freq * (t - center))
        return (1e-21 * rng.normal(size=n) + sig), rate

    return fetch


def test_read_gravityspy_csv_label_from_filename(tmp_path):
    p = tmp_path / "Koi_Fish_O3a.csv"
    p.write_text("GPStime,snr,ifo\n1238166018.0,12.5,H1\n1238166100.5,8.0,L1\n")
    rows = read_gravityspy_csv(str(p))
    assert [r["label"] for r in rows] == ["Koi Fish", "Koi Fish"]
    assert rows[0]["GPStime"] == 1238166018.0 and rows[1]["ifo"] == "L1"
    # explicit label column wins
    p2 = tmp_path / "whatever.csv"
    p2.write_text("GPStime,snr,ifo,label\n100.0,9.0,H1,Tomte\n")
    assert read_gravityspy_csv(str(p2))[0]["label"] == "Tomte"


def test_fetch_glitch_window_geometry():
    row = {"GPStime": 1238166018.0, "snr": 10.0, "ifo": "H1"}
    window = fetch_glitch_window(row, _fake_fetch_factory())
    assert window is not None and window.shape == (2048,)  # 1 s @ 2048 Hz
    # the injected glitch sits 0.8 s into the window (reference crop
    # [gps-0.8, gps+0.2)); peak energy must be near sample 0.8*2048
    peak = np.argmax(np.abs(window))
    assert abs(peak - int(0.8 * 2048)) < 120


def test_fetch_glitch_window_failure_paths():
    def failing(ifo, a, b):
        raise ValueError("no data")

    assert fetch_glitch_window({"GPStime": 1.0, "snr": 0, "ifo": "H1"}, failing) is None


def test_build_gravityspy_corpus(tmp_path):
    csv1 = tmp_path / "Blip.csv"
    csv1.write_text("GPStime,snr,ifo\n1238166018.0,12.5,H1\n1238166100.5,8.0,L1\n")
    csv2 = tmp_path / "Tomte.csv"
    csv2.write_text("GPStime,snr,ifo\n1238167000.0,9.0,H1\n")
    out = str(tmp_path / "corpus.hdf")
    n = build_gravityspy_corpus([str(csv1), str(csv2)], out,
                                fetch_fn=_fake_fetch_factory())
    assert n == 3
    with h5py.File(out) as f:
        assert f["strain"].shape == (3, 2048)
        assert list(f["labels"][()]) == [CLASS_TO_INDEX["Blip"]] * 2 + [CLASS_TO_INDEX["Tomte"]]
        np.testing.assert_allclose(f["SNR"][()], [12.5, 8.0, 9.0])


def test_fetch_event_file_layout(tmp_path):
    out = str(tmp_path / "events.hdf")
    fetch_event_file({"GW150914": 1126259462.4}, out, fetch_fn=_fake_fetch_factory())
    with h5py.File(out) as f:
        g = f["GW150914"]
        # 16 s at 2048 Hz after the 4096 -> 2048 decimation
        assert g["h1_strain"].shape == (int(16 * 2048),)
        assert g["l1_strain"].shape == (int(16 * 2048),)
        assert g.attrs["gps"] == 1126259462.4


def test_gwpy_fetch_gated():
    from gwkit.data.fetch import gwpy_fetch

    with pytest.raises((RuntimeError, Exception)):
        gwpy_fetch("H1", 0.0, 1.0)  # gwpy absent (or no network) here


# ---------------------------------------------------------------------------
# ds4 real-noise downloader (resumable byte-range HTTP; zero-egress: tested
# against a local http.server fixture, per VERDICT r3 #3)
# ---------------------------------------------------------------------------
import contextlib
import http.server
import threading


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Byte-range file server; optionally drops the connection after
    ``max_bytes_per_request`` body bytes to simulate an interrupted
    transfer. ``honor_range=False`` replies 200 to ranged requests (a
    misbehaving server the downloader must restart against)."""

    payload = b""
    max_bytes_per_request = None
    honor_range = True
    range_requests: list = []

    def do_GET(self):
        total = len(self.payload)
        start = 0
        rng = self.headers.get("Range")
        if rng:
            type(self).range_requests.append(rng)
        if rng and self.honor_range:
            start = int(rng.split("=")[1].split("-")[0])
            if start >= total:
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{total}")
                self.end_headers()
                return
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {start}-{total - 1}/{total}")
        else:
            self.send_response(200)
        body = self.payload[start:]
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        cut = type(self).max_bytes_per_request
        if cut is not None and len(body) > cut:
            self.wfile.write(body[:cut])
            self.wfile.flush()
            self.connection.close()  # abrupt mid-transfer drop
        else:
            self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@contextlib.contextmanager
def _serve(payload, max_bytes_per_request=None, honor_range=True):
    handler = type("H", (_RangeHandler,), {
        "payload": payload,
        "max_bytes_per_request": max_bytes_per_request,
        "honor_range": honor_range,
        "range_requests": [],
    })
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/real_noise_file.hdf", handler
    finally:
        srv.shutdown()
        t.join()


def _challenge_noise_bytes(tmp_path) -> bytes:
    """A small valid HDF5 in the challenge real-noise layout."""
    src = tmp_path / "src_real_noise.hdf"
    with h5py.File(src, "w") as f:
        for det in ("H1", "L1"):
            f.create_group(det).create_dataset(
                "1238166018", data=np.random.default_rng(0).normal(size=4096))
    return src.read_bytes()


def test_download_file_resumes_after_interruption(tmp_path):
    from gwkit.data.fetch import download_file

    payload = _challenge_noise_bytes(tmp_path)
    assert len(payload) > 4000
    dest = str(tmp_path / "dl.hdf")
    with _serve(payload, max_bytes_per_request=1500) as (url, handler):
        size = download_file(url, dest, chunk_size=512)
    assert size == len(payload)
    with open(dest, "rb") as f:
        assert f.read() == payload
    # the transfer was actually interrupted and resumed via Range headers
    assert len(handler.range_requests) >= 2
    assert handler.range_requests[0].startswith("bytes=")


def test_download_file_restarts_when_server_ignores_range(tmp_path):
    from gwkit.data.fetch import download_file

    payload = _challenge_noise_bytes(tmp_path)
    dest = tmp_path / "dl.hdf"
    dest.write_bytes(payload[:1000])  # stale partial from a previous attempt
    with _serve(payload, honor_range=False) as (url, handler):
        size = download_file(url, str(dest), resume=True)
    # a 200 reply to the ranged request must RESTART, not append a second copy
    assert size == len(payload)
    assert dest.read_bytes() == payload
    assert len(handler.range_requests) == 1


def test_download_real_noise_kill_and_resume(tmp_path, monkeypatch):
    """Kill a transfer mid-flight (downloader capped to zero retries so the
    partial file survives), then resume in a 'second process'."""
    from gwkit.data.fetch import download_file, download_real_noise

    payload = _challenge_noise_bytes(tmp_path)
    dest = str(tmp_path / "real_noise_file.hdf")

    # first attempt: the server drops the connection after 1200 bytes, and
    # the "process" dies (KeyboardInterrupt) when the downloader re-issues
    # its first ranged resume request
    with _serve(payload, max_bytes_per_request=1200) as (url, handler):
        reads = {"n": 0}
        import urllib.request

        orig = urllib.request.urlopen

        def dying_urlopen(req, timeout=None):
            reads["n"] += 1
            if reads["n"] > 1:
                raise KeyboardInterrupt  # "process killed" after 1st request
            return orig(req, timeout=timeout)

        monkeypatch.setattr(urllib.request, "urlopen", dying_urlopen)
        with pytest.raises(KeyboardInterrupt):
            download_file(url, dest, chunk_size=512)
        monkeypatch.setattr(urllib.request, "urlopen", orig)

        # partial file on disk, NOT a readable HDF5
        assert 0 < len(open(dest, "rb").read()) < len(payload)
        # "new process": download_real_noise finishes the transfer in place
        out = download_real_noise(dest, url=url)
    assert out == dest
    with open(dest, "rb") as f:
        assert f.read() == payload
    with h5py.File(dest) as f:
        assert set(f.keys()) == {"H1", "L1"}
    assert any(r.startswith("bytes=") for r in handler.range_requests)


def test_download_real_noise_redownloads_corrupt_file(tmp_path):
    """A full-size but unreadable file (reference generate_data.py:276-281:
    'If file can't be opened it is probably not done downloading') is
    re-downloaded from scratch."""
    from gwkit.data.fetch import download_real_noise

    payload = _challenge_noise_bytes(tmp_path)
    dest = tmp_path / "real_noise_file.hdf"
    dest.write_bytes(b"\x00" * len(payload))  # corrupt, full size
    with _serve(payload) as (url, handler):
        out = download_real_noise(str(dest), url=url)
    assert out == str(dest)
    assert dest.read_bytes() == payload
    with h5py.File(out) as f:
        assert set(f.keys()) == {"H1", "L1"}


def test_download_real_noise_skips_existing_readable(tmp_path):
    from gwkit.data.fetch import download_real_noise

    payload = _challenge_noise_bytes(tmp_path)
    dest = tmp_path / "real_noise_file.hdf"
    dest.write_bytes(payload)
    # no server at this URL: must not touch the network at all
    out = download_real_noise(str(dest), url="http://127.0.0.1:1/nope.hdf")
    assert out == str(dest)
