"""Direct unit tests for the auxiliary-subsystem utilities (SURVEY.md §5).

Covers the gwkit equivalents of the reference's observability helpers:
progress_tracker/DictList/MPCounter (bnslib.py:892-1103, 1750-1977),
the SummaryWriter + losses.txt metrics sinks (Signal_vs_Noise/src/
train.py:186-188), the uniform logging config (MLGWSC-1/train.py:832-843),
phase timers, and the explicit-PRNG key sequence.
"""
import io
import logging
import threading

import jax
import jax.numpy as jnp
import pytest

from gwkit.utils.logging import configure_logging
from gwkit.utils.metrics_writer import MetricsWriter
from gwkit.utils.prng import key_seq
from gwkit.utils.progress import Counter, DictList, ProgressTracker
from gwkit.utils.tracing import PhaseTimer, annotate, trace


def test_phase_timer_accumulates_and_reports():
    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    with pt.phase("a"):
        pass
    with pt.phase("b"):
        pass
    assert pt.counts == {"a": 2, "b": 1}
    assert pt.totals["a"] >= 0.0 and pt.totals["b"] >= 0.0
    report = pt.report()
    assert "a: " in report and "over 2 calls" in report


def test_phase_timer_records_on_exception():
    pt = PhaseTimer()
    with pytest.raises(ValueError):
        with pt.phase("boom"):
            raise ValueError("x")
    assert pt.counts["boom"] == 1


def test_trace_none_is_noop():
    with trace(None):
        x = 1 + 1
    assert x == 2


def test_annotate_runs_eagerly():
    with annotate("region"):
        y = float(jnp.sum(jnp.ones((3,))))
    assert y == 3.0


def test_progress_tracker_bar_and_completion():
    out = io.StringIO()
    pt = ProgressTracker(total=4, name="T", steps=10, out=out)
    for _ in range(4):
        pt.iterate()
    text = out.getvalue()
    assert "100.0%" in text
    assert "T: done in" in text
    # the completed bar is fully filled
    assert "=" * 10 in text


def test_progress_tracker_thread_safe_counts():
    out = io.StringIO()
    pt = ProgressTracker(total=400, out=out)
    threads = [
        threading.Thread(target=lambda: [pt.iterate(print_update=False) for _ in range(100)])
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert pt.count == 400


def test_dictlist_surface():
    dl = DictList({"a": [1]})
    dl.append("a", 2)
    dl.append({"a": 3, "b": 10})  # dict append fans out per key
    dl.extend({"b": [11, 12]})
    other = DictList({"c": [0]})
    dl.extend(other)
    assert dl.as_dict() == {"a": [1, 2, 3], "b": [10, 11, 12], "c": [0]}
    assert dl["a"] == [1, 2, 3]
    assert set(dl.keys()) == {"a", "b", "c"}
    assert len(dl) == 3


def test_counter_thread_safe():
    c = Counter()
    threads = [
        threading.Thread(target=lambda: [c.increment() for _ in range(1000)])
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert c.value == 4000


def test_metrics_writer_tsv(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w(0, {"loss": 1.5, "auc": 0.9})
    w(1, {"loss": 1.2})
    w.close()
    rows = [ln.split("\t") for ln in (tmp_path / "scalars.tsv").read_text().splitlines()]
    assert ["0", "loss", "1.5"] in rows
    assert ["1", "loss", "1.2"] in rows
    assert len(rows) == 3
    # append mode: a second writer extends the same file
    w2 = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w2(2, {"loss": 1.0})
    w2.close()
    assert len((tmp_path / "scalars.tsv").read_text().splitlines()) == 4


def test_configure_logging_level_mapping(monkeypatch):
    captured = {}
    monkeypatch.setattr(logging, "basicConfig", lambda **kw: captured.update(kw))
    configure_logging()
    assert captured["level"] == logging.WARNING
    configure_logging(verbose=True)
    assert captured["level"] == logging.INFO
    configure_logging(debug=True)
    assert captured["level"] == logging.DEBUG
    assert "%(levelname)s" in captured["format"]


def test_key_seq_deterministic_and_distinct():
    seq = key_seq(7)
    keys = [next(seq) for _ in range(4)]
    # deterministic from the same seed
    seq2 = key_seq(7)
    keys2 = [next(seq2) for _ in range(4)]
    for a, b in zip(keys, keys2):
        assert jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    # all distinct
    datas = [tuple(map(int, jax.random.key_data(k).ravel())) for k in keys]
    assert len(set(datas)) == 4
    # accepts an existing key too
    seq3 = key_seq(jax.random.PRNGKey(7))
    k3 = next(seq3)
    assert jnp.array_equal(jax.random.key_data(k3), jax.random.key_data(keys[0]))


def test_dictlist_full_surface():
    """The remaining bnslib DictList surface (bnslib.py:1750-1937):
    construction wrapping, contains/get/pop, join/__add__/__radd__, count."""
    from gwkit.utils.progress import DictList

    dl = DictList({"a": 1, "b": [2, 3]})  # non-list values wrap
    assert dl["a"] == [1] and dl["b"] == [2, 3]
    assert "a" in dl and "z" not in dl
    assert dl.get("z", "d") == "d"
    assert sorted(dl.keys()) == ["a", "b"]
    assert list(dl.values()) and list(dl.items())

    joined = dl + {"a": [10], "c": 7}
    assert joined["a"] == [1, 10] and joined["c"] == [7]
    assert dl["a"] == [1]  # + copies
    radd = {"a": [0]} + dl
    assert radd["a"] == [0, 1]
    with pytest.raises(TypeError):
        dl + 3
    with pytest.raises(TypeError):
        DictList([1, 2])

    dl.append({"a": 5, "d": 6})
    assert dl["a"] == [1, 5] and dl["d"] == [6]
    dl.extend("d", value=[7, 8])
    assert dl["d"] == [6, 7, 8]
    assert dl.count(5) == 1
    assert dl.count(6, keys="all") == {"a": 0, "b": 0, "d": 1}
    assert dl.count(1, keys=["a", "zz"]) == {"a": 1, "zz": 0}
    assert dl.pop("d") == [6, 7, 8]
    assert dl.pop("zz", None) is None


def _mp_counter_worker(args):
    counter, n = args
    for _ in range(n):
        counter.increment()


def test_mp_counter_across_processes():
    """MPCounter (bnslib.py:1939-1977): real fork-inherited processes
    incrementing one shared value, plus the int/Counter arithmetic."""
    import multiprocessing as mp

    from gwkit.utils.progress import MPCounter

    c = MPCounter(5)
    assert c.value == 5 and c == 5
    c.increment(3)
    assert c == 8
    c += 2
    assert (c + MPCounter(1)).value == 11 and (c + 4) == 14
    with pytest.raises(TypeError):
        c == "x"
    with pytest.raises(TypeError):
        MPCounter(1.5)

    ctx = mp.get_context("fork")
    shared = MPCounter(0)
    procs = [ctx.Process(target=_mp_counter_worker, args=((shared, 50),))
             for _ in range(3)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
    assert shared.value == 150


def _mp_progress_worker(args):
    tracker, n = args
    for _ in range(n):
        tracker.iterate()


def test_mp_progress_tracker_across_processes():
    import io
    import multiprocessing as mp

    from gwkit.utils.progress import MPProgressTracker

    out = io.StringIO()
    tracker = MPProgressTracker(100, name="mp", out=out)
    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=_mp_progress_worker, args=((tracker, 50),))
             for _ in range(2)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
    assert tracker.shared_count == 100
    tracker.print_update()
    text = out.getvalue()
    assert "100.0%" in text and "done" in text
