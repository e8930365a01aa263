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
