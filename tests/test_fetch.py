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
