"""Unit tests for the durable month pipeline's pure parts
(scripts/month_pipeline.py): span alignment, seeding, and the
assemble/evaluate stage over synthetic per-segment state."""
import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mp():
    spec = importlib.util.spec_from_file_location(
        "month_pipeline", os.path.join(REPO, "scripts", "month_pipeline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_aligned_spans_block_multiples_and_total(mp):
    spans = mp.aligned_spans(2.0)
    total = sum(e - s for s, e in spans)
    assert total >= 2.0 * 86400.0
    assert total < 2.0 * 86400.0 + mp.BLOCK_S
    for s, e in spans:
        assert (e - s) % mp.BLOCK_S == 0
        assert e - s >= 2 * mp.BLOCK_S


def test_aligned_spans_prefix_stable(mp):
    """A longer horizon extends the span list without changing the prefix —
    the cross-session resume contract."""
    short = mp.aligned_spans(1.0)
    long = mp.aligned_spans(3.0)
    # every span but the horizon-trimmed last one is a prefix of the longer run
    for a, b in zip(short[:-1], long[: len(short) - 1]):
        assert a == b
    assert short[-1][0] == long[len(short) - 1][0]


def test_seg_seeds_distinct(mp):
    seeds = [mp.seg_seed(11, si) for si in range(300)]
    assert len(set(seeds)) == len(seeds)
    assert all(s != 11 for s in seeds)


def test_assemble_and_evaluate_from_state(mp, tmp_path):
    """Synthetic two-segment state: loud fg triggers at injection times and
    a quieter bg trigger bed -> challenge stats with full recovery at the
    loose FAR and a monotone sensitive-distance table."""
    state = str(tmp_path)
    os.makedirs(os.path.join(state, "seg"))
    spans = [(1000000.0, 1000000.0 + 4096.0), (1010000.0, 1010000.0 + 4096.0)]
    rng = np.random.default_rng(0)
    for si, (start, end) in enumerate(spans):
        base = os.path.join(state, "seg", f"{si:03d}")
        inj_tc = np.arange(start + 100.0, end - 100.0, 256.0)
        n = len(inj_tc)
        inj = {
            "tc": inj_tc,
            "distance": rng.uniform(100.0, 4000.0, n),
            "mass1": rng.uniform(10.0, 50.0, n),
            "mass2": rng.uniform(10.0, 50.0, n),
        }
        np.savez_compressed(f"{base}_inj.npz", **inj)
        fg = {
            "time": inj_tc + rng.uniform(-0.05, 0.05, n),
            "stat": np.full(n, 30.0, np.float32),
        }
        np.savez_compressed(f"{base}_fg.npz", **fg)
        bg_t = np.arange(start + 50.0, end - 50.0, 64.0)
        bg = {
            "time": bg_t,
            "stat": rng.uniform(-0.5, 5.0, len(bg_t)).astype(np.float32),
        }
        np.savez_compressed(f"{base}_bg.npz", **bg)
        meta = {
            "segment": si, "start": start, "end": end, "gen_wall_s": 10.0,
            "fg": {"wall_s": 8.0, "windows": 40960, "strain_seconds": 4096.0,
                   "raw_triggers": n},
            "bg": {"wall_s": 8.0, "windows": 40960, "strain_seconds": 4096.0,
                   "raw_triggers": len(bg_t)},
        }
        with open(f"{base}_meta.json", "w") as f:
            json.dump(meta, f)

    summary = mp.assemble_and_evaluate(state, spans, threshold=-0.5, days=0.1)
    assert summary["segments_done"] == 2
    assert summary["analyzed_days"] == pytest.approx(2 * 4096.0 / 86400.0, abs=1e-3)
    assert summary["n_injections_analyzed"] == sum(
        len(np.load(os.path.join(state, "seg", f"{si:03d}_inj.npz"))["tc"])
        for si in range(2))
    # every loud fg trigger is an injection recovery at the loosest FAR
    assert summary["best_sensitive_fraction"] == pytest.approx(1.0)
    table = summary["sensitive_distance_mpc"]
    assert table  # non-empty
    vals = [table[k] for k in sorted(table, key=lambda k: -float(k.split("<=")[1].split("/")[0]))]
    assert all(b <= a + 1e-6 for a, b in zip(vals, vals[1:]))  # tighter FAR, smaller reach
    assert os.path.isfile(os.path.join(state, "fg_events.hdf"))
    assert os.path.isfile(os.path.join(state, "summary.json"))


def test_assemble_skips_when_empty(mp, tmp_path, capsys):
    os.makedirs(tmp_path / "seg")
    out = mp.assemble_and_evaluate(str(tmp_path), [(0.0, 256.0)], -0.5, 1.0)
    assert out is None
