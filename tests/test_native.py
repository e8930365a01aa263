"""Native host-IO runtime tests (C++ build + ctypes bindings)."""
import h5py
import numpy as np
import pytest

from gwkit.native.hostio import (
    ChunkLoader,
    available,
    extract_windows,
    f64_to_f32,
    read_contiguous_dataset,
)

needs_native = pytest.mark.skipif(not available(), reason="g++ unavailable")


def test_f64_to_f32(rng):
    x = rng.normal(size=1000)
    np.testing.assert_array_equal(f64_to_f32(x), x.astype(np.float32))


def test_extract_windows(rng):
    src = rng.normal(size=(2, 500)).astype(np.float32)
    starts = np.array([0, 100, 250], np.int64)
    out = extract_windows(src, starts, 128)
    assert out.shape == (3, 2, 128)
    for i, s in enumerate(starts):
        np.testing.assert_array_equal(out[i], src[:, s : s + 128])


@needs_native
def test_chunk_loader_round_trip(tmp_path, rng):
    data = rng.normal(size=100_000)
    path = str(tmp_path / "raw.bin")
    data.tofile(path)
    loader = ChunkLoader(path, 0, len(data), on_disk_f64=True, chunk_elems=9999)
    chunks = list(loader)
    loader.close()
    out = np.concatenate(chunks)
    np.testing.assert_array_equal(out, data.astype(np.float32))


@needs_native
def test_read_contiguous_hdf5(tmp_path, rng):
    path = str(tmp_path / "seg.hdf")
    data = rng.normal(size=(2, 50_000))
    with h5py.File(path, "w") as f:
        f.create_dataset("H1", data=data)  # contiguous by default
    with h5py.File(path, "r") as f:
        out = read_contiguous_dataset(path, f["H1"])
    assert out is not None
    np.testing.assert_array_equal(out, data.astype(np.float32))


@needs_native
def test_read_contiguous_rejects_chunked(tmp_path, rng):
    path = str(tmp_path / "seg.hdf")
    with h5py.File(path, "w") as f:
        f.create_dataset("H1", data=rng.normal(size=10_000), chunks=(1000,), compression="gzip")
    with h5py.File(path, "r") as f:
        assert read_contiguous_dataset(path, f["H1"]) is None


@needs_native
def test_array_prefetch_matches_direct_read(tmp_path, rng):
    from gwkit.native.hostio import ArrayPrefetch, dataset_prefetch_meta

    path = str(tmp_path / "seg.hdf")
    d64 = rng.normal(size=(2, 30_000))
    d32 = rng.normal(size=(2, 10_000)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("A", data=d64)
        f.create_dataset("B", data=d32)
    with h5py.File(path, "r") as f:
        ma = dataset_prefetch_meta(f["A"])
        mb = dataset_prefetch_meta(f["B"])
    assert ma is not None and ma[2] is True  # f64 on disk
    assert mb is not None and mb[2] is False
    pa, pb = ArrayPrefetch(path, *ma), ArrayPrefetch(path, *mb)
    np.testing.assert_array_equal(pb.wait(), d32)  # waited out of issue order
    np.testing.assert_array_equal(pa.wait(), d64.astype(np.float32))


@needs_native
def test_stream_segments_native_matches_eager(tmp_path, rng):
    """The C++ prefetch streaming path yields byte-identical segments in the
    same (longest-first) order as the eager reader."""
    from gwkit.search.slicer import native_streamable, read_segments, stream_segments

    path = str(tmp_path / "search.hdf")
    with h5py.File(path, "w") as f:
        for det in ("H1", "L1"):
            g = f.create_group(det)
            for i, n in enumerate((40_000, 90_000, 10_000)):
                ds = g.create_dataset(f"seg{i}", data=rng.normal(size=n))
                ds.attrs["start_time"] = 1000.0 * i
                ds.attrs["delta_t"] = 1.0 / 2048
    assert native_streamable(path)
    eager = read_segments(path)
    streamed = list(stream_segments(path))
    assert [s.key for s in streamed] == [s.key for s in eager] == ["seg1", "seg0", "seg2"]
    for a, b in zip(eager, streamed):
        np.testing.assert_array_equal(a.strain, b.strain)
        assert a.start_time == b.start_time and a.delta_t == b.delta_t
